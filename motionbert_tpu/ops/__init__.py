from motionbert_tpu.ops.attention import st_attention
