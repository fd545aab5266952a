"""Stream-fused DSTformer kernel: one stream's TWO (attention+MLP) pair
sub-blocks — spatial and temporal, in either order — plus the optional
att_fuse gate epilogue, in ONE Pallas kernel with the whole clip resident
in VMEM.

Why: on the pair-kernel path each DSTformer layer round-trips ~38 MB/clip
of sub-block boundary activations through HBM (x is read by both streams;
each stream's intermediate is written and re-read; the gate reads the twin
stream) — ~190 MB/clip over depth 5 ≈ 0.6 ms at the chip's measured
~310 GB/s against a ~3.4 ms bf16 forward, partially DMA-hidden (model-level
~107 TF/s vs 115-119 in-kernel). Fusing each stream's two pairs removes the
intra-stream boundary: per layer the traffic drops 37.8 -> 21 MB/clip.

Layout strategy (the part a TPU compile must validate): the resident clip
stays in the (F, J*C) view for the WHOLE kernel, so crossing the
spatial<->temporal boundary never transposes or reshapes across the lane
dim (Mosaic relayouts of a (F*J, C) <-> (F, J*C) view move lane data across
sublanes and are the known-risky lowering):

- temporal groups read/write lane-aligned COLUMN slabs [:, j*C:(j+1)*C]
  (C % 128 == 0 is a precondition, as on the pair path);
- spatial tiles read a row slab [f0:f0+tf, :] and regroup it into j-major
  (J*tf, C) token rows by concatenating its J column slices — pure
  lane-aligned slices + sublane-aligned concats (tf = 16 keeps bf16 row
  slices on 16-sublane tile boundaries);
- EVERY regrouped row piece is zero-padded to a multiple-of-16 row stride
  (_pad_rows) before an axis=1 concat: the real Mosaic lowering rejects
  tpu.concatenate when inputs' sublane offsets mismatch on a non-concat
  dimension (measured on-chip r4 — the 3-frame tail of F=243 and the
  243-row temporal groups both hit it). The pad frames are explicit
  zeros, masked out of attention as keys, and cost only matmul rows the
  MXU tiling would have padded anyway.

Pass 1 writes the output block; pass 2 updates it in place (its groups
partition rows/columns, so in-place is race-free within one program). The
inter-pair activation is rounded to the compute dtype exactly where the
pair path rounds it for the HBM round trip, so the stream kernel's output
matches the two-pair composition's bit-for-bit rounding points.

Grouping: projections/MLP matmuls still batch multiple attention groups
into one (rows, C) matmul (`ks` spatial tiles / `kt` temporal joints per
_pair_rows call) — the MXU-utilization lever from the pair kernels — but
the whole-clip residency (x + out [+ other] blocks + both pairs' weights)
leaves less VMEM for transients than the pair launches had, so row counts
per matmul are lower (243-544 vs the pair path's up to 972).

MEASURED VERDICT (round 4, real chip — tools/probe_stream.py): the
kernel LOSES to the pair composition at every feasible grouping — bf16
(ks=1,kt=1) 48.59 vs 44.10 ms, W8A8 (ks=2,kt=2) 45.36 vs 42.36 ms per
flagship stream — the pair path's (bb, tile) grid pipelining hides the
intra-stream boundary traffic more cheaply than whole-clip residency
buys it back. The lowering is correct on hardware (on-chip rel err
5.7e-4 vs the pair path; full H36M protocol through pallas_stream_q8
within 0.02 mm of the q8 pair tier), so the kernels stay in-tree as the
recorded answer to the stream-fusion question, permanently OPT-IN
(attn_impl="pallas_stream"/"pallas_stream_q8"; bench --stream). See
design.md "Stream fusion: measured rejection".

Backward (custom VJP): recompute pass-1's output with the standalone pair
kernel and chain the two existing fused pair backward kernels — exactly
the gradient of the two-pair composition. Training stays on the pair path
by default (the extra pass-1 forward kernel makes the stream VJP strictly
more HBM traffic than the pair VJPs); the stream kernel targets the
inference/serving path.

Behavior parity target: /root/reference/lib/model/DSTformer.py:214-267
(Block stage_st/stage_ts) + 340-351 (att_fuse gate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from motionbert_tpu.ops.attention import _on_tpu, _vmem_params
from motionbert_tpu.ops.fused_pair import (
    _gate_rows, _gate_xla, _pair_bwd_pallas, _pair_pallas, _pair_rows,
    _pair_xla)

# Spatial frame tile: 16 frames/tile keeps every row slice of the resident
# bf16 (F, J*C) block on a (16, 128) tile boundary (the pair kernels' tf=8
# would halve the mask-padded score work but slices bf16 tiles mid-sublane).
STREAM_TF = 16

# VMEM budget for the group picker. 26 MB mirrors the pair forward's
# proven envelope (compiles under the 28 MB compiler limit on this chip);
# probe higher on real hardware before raising.
STREAM_BUDGET = 26 << 20


def _pick_stream_groups(F, J, C, hidden, itemsize, gated, q8=False):
    """(tf, ks, kt): spatial frame tile, spatial tiles per matmul group,
    temporal joints per matmul group, sized so resident blocks + weights +
    one group's f32 transients fit STREAM_BUDGET. The two passes run
    sequentially, so each pass's transients can use the full remainder.
    q8 weights are int8 (half the bf16 residency), buying larger groups.

    Returns None when the configuration is INFEASIBLE — the resident
    blocks + weights plus even a single minimum-size group's transients
    exceed the budget (e.g. fp32 inputs or clips much longer than 243
    frames). Callers fall back to the pair-kernel composition instead of
    launching a kernel the compiler would reject past its VMEM cap."""
    if F < STREAM_TF:
        # tf would drop below 16: the rolled spatial fori path slices at
        # stride tf, putting pieces on non-16-multiple sublane offsets —
        # the Mosaic tpu.concatenate offset mismatch measured on-chip
        # (module docstring). Short clips take the pair fallback instead.
        return None
    tf = STREAM_TF
    fpad = -(-F // 16) * 16  # sublane padding of the resident blocks
    resident = (3 if gated else 2) * fpad * J * C * itemsize
    w_elems = 3 * C * C + C * C + 2 * C * hidden
    resident += 2 * (w_elems if q8 else w_elems * itemsize)
    per_row = (3 * C + hidden + 3 * C) * 4 + 4 * C * itemsize
    avail = STREAM_BUDGET - resident
    # minimum viable launch: ks=1 spatial group (tf*J rows) for one pass,
    # kt=1 temporal group (fpad rows — groups are zero-padded to the
    # 16-aligned stride, see _pad_rows) for the other
    if avail < max(tf * J, fpad) * per_row:
        return None
    ks = max(1, min(4, avail // (tf * J * per_row)))
    kt = max(1, min(8, avail // (fpad * per_row)))
    return tf, int(ks), int(kt)


def _stream_pairs_fallback(x, other, p1, p2, wg, bg, num_heads, scale,
                           order, q8=False):
    """Pair-kernel composition for shapes the stream picker rejects:
    numerically the pair path itself (the automatic-fallback convention —
    ops.attention falls back to XLA the same way for unaligned channels)."""
    from motionbert_tpu.ops.fused_pair import (fused_gated_pair_block,
                                               fused_pair_block)

    if q8:
        from motionbert_tpu.ops.pair_q8 import (fused_gated_pair_block_q8,
                                                fused_pair_block_q8)
        pair_fn, gated_fn = fused_pair_block_q8, fused_gated_pair_block_q8
    else:
        pair_fn, gated_fn = fused_pair_block, fused_gated_pair_block
    mode1 = "spatial" if order[0] == "s" else "temporal"
    mode2 = "spatial" if order[1] == "s" else "temporal"
    y = pair_fn(x, *p1, num_heads, scale, mode1)
    if other is None:
        return pair_fn(y, *p2, num_heads, scale, mode2)
    return gated_fn(y, other, *p2, wg, bg, num_heads, scale, mode2)


def _same_frame_mask_jmajor(nf, J, valid=None):
    """(J*nf, J*nf) same-frame select mask for j-major token rows
    (r = j*nf + f): frame id is r % nf. `valid` (< nf) additionally
    excludes zero-padded frames >= valid as attention keys."""
    N = nf * J
    r = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    mask = (r % nf) == (c % nf)
    if valid is not None and valid != nf:
        mask = mask & ((c % nf) < valid)
    return mask


def _pad_rows(piece, to_rows):
    """Zero-pad a (n, C) piece to (to_rows, C).

    Regrouping row pieces with jnp.concatenate is the Mosaic-critical op in
    this kernel: the lowering rejects concatenation when inputs' sublane
    offsets mismatch on a NON-concat dimension (measured on-chip r4:
    "tpu.concatenate ... result/input offset mismatch"), which happens
    exactly when pieces sit at row strides that are not multiples of the
    16-sublane bf16 tile (e.g. the 3-frame tail of F=243, or F=243-row
    temporal groups). Padding every piece to a multiple-of-16 row count
    keeps all piece offsets at 0 so the axis=1 regroup concats lower; the
    zeros are masked out of attention (select mask + explicit zero values,
    the pair kernels' edge-block convention) and the padded matmul rows are
    rows the MXU would have padded to tile boundaries anyway."""
    n = piece.shape[0]
    if n == to_rows:
        return piece
    return jnp.concatenate(
        [piece, jnp.zeros((to_rows - n, piece.shape[1]), piece.dtype)],
        axis=0)


def _stream_kernel(num_heads, scale, J, order, gated, tf, ks, kt, C, q8,
                   *refs):
    """Grid (B,): one whole clip per program. refs: x, [other], pass-1
    params, pass-2 params (12 each, 16 when q8: + per-channel weight
    scales), [wga, wgb, bg], out."""
    from motionbert_tpu.ops.pair_q8 import _pair_rows_q8

    rows_fn = _pair_rows_q8 if q8 else _pair_rows
    n = 16 if q8 else 12
    base = 2 if gated else 1
    x_ref = refs[0]
    other_ref = refs[1] if gated else None
    p1, p2 = refs[base:base + n], refs[base + n:base + 2 * n]
    if gated:
        wga_ref, wgb_ref, bgg_ref = refs[base + 2 * n:base + 2 * n + 3]
        o_ref = refs[base + 2 * n + 3]
    else:
        wga_ref = wgb_ref = bgg_ref = None
        o_ref = refs[base + 2 * n]
    F = x_ref.shape[1]

    Fp = -(-F // 16) * 16  # temporal group row stride, 16-sublane aligned

    def gather_spatial(ref, f0, nf, nfp):
        # (nf, J*C) row slab -> (J*nfp, C) j-major token rows, each joint's
        # piece zero-padded to the aligned per-joint stride nfp. f0 may be
        # a traced loop index (always a multiple of tf=16, sublane-aligned).
        slab = ref[0, pl.ds(f0, nf), :]
        return jnp.concatenate(
            [_pad_rows(slab[:, j * C:(j + 1) * C], nfp) for j in range(J)],
            axis=0)

    def scatter_spatial(rows, f0, nf, nfp):
        # (J*nfp, C) j-major token rows -> one (nf, J*C) row-slab write;
        # pieces at stride nfp keep uniform sublane offset 0 for the concat
        slab = jnp.concatenate(
            [rows[j * nfp:j * nfp + nf, :] for j in range(J)], axis=1)
        o_ref[0, pl.ds(f0, nf), :] = slab.astype(o_ref.dtype)

    # Group loops run under lax.fori_loop, NOT unrolled: at flagship dims
    # the picker lands on ks=1/kt=1, and unrolling then inlines 33 full
    # attention+MLP bodies (~700 matmul ops) into one Mosaic kernel — the
    # real TPU compile of that form never finished inside 10 minutes
    # (measured r4). Uniform groups go through a single traced body with
    # dynamic but tile-aligned slice starts (multiples of tf=16 sublanes /
    # C lanes); only the non-uniform leftovers (< ks full tiles, the F%tf
    # tail, < kt joints) stay unrolled.

    def spatial_group(src_ref, params, gate_here, f0, nf, nfp, k, mask):
        # one matmul group: k tiles of nf frames starting at f0
        parts = [gather_spatial(src_ref, f0 + i * tf, nf, nfp)
                 for i in range(k)]
        xg = parts[0] if k == 1 else jnp.concatenate(parts, axis=0)
        out = rows_fn(xg, k, num_heads, scale, mask, *params)
        if gate_here:
            op = [gather_spatial(other_ref, f0 + i * tf, nf, nfp)
                  for i in range(k)]
            og = op[0] if k == 1 else jnp.concatenate(op, axis=0)
            out = _gate_rows(og, out, wga_ref, wgb_ref, bgg_ref)
        n = J * nfp
        for i in range(k):
            scatter_spatial(out[i * n:(i + 1) * n], f0 + i * tf, nf, nfp)

    def spatial_pass(src_ref, params, gate_here):
        nfull = F // tf
        g_full = nfull // ks
        if g_full:
            mask = _same_frame_mask_jmajor(tf, J)

            def body(i, c):
                spatial_group(src_ref, params, gate_here, i * (ks * tf),
                              tf, tf, ks, mask)
                return c

            jax.lax.fori_loop(0, g_full, body, 0)
        # leftover full tiles (nfull % ks of them) + the F % tf tail tile
        for f0 in range(g_full * ks * tf, F, tf):
            nf = min(tf, F - f0)
            nfp = -(-nf // 16) * 16
            mask = _same_frame_mask_jmajor(nfp, J, valid=nf)
            spatial_group(src_ref, params, gate_here, f0, nf, nfp, 1, mask)

    def temporal_group(src_ref, params, gate_here, j0c, g, vmask):
        # one matmul group: g joints' (F, C) column slabs from lane
        # offset j0c (a multiple of C, lane-aligned)
        slab = src_ref[0, :, pl.ds(j0c, g * C)]
        xg = jnp.concatenate(
            [_pad_rows(slab[:, i * C:(i + 1) * C], Fp)
             for i in range(g)], axis=0)
        out = rows_fn(xg, g, num_heads, scale, vmask, *params)
        if gate_here:
            osl = other_ref[0, :, pl.ds(j0c, g * C)]
            og = jnp.concatenate(
                [_pad_rows(osl[:, i * C:(i + 1) * C], Fp)
                 for i in range(g)], axis=0)
            out = _gate_rows(og, out, wga_ref, wgb_ref, bgg_ref)
        res = jnp.concatenate(
            [out[i * Fp:i * Fp + F] for i in range(g)], axis=1)
        o_ref[0, :, pl.ds(j0c, g * C)] = res.astype(o_ref.dtype)

    def temporal_pass(src_ref, params, gate_here):
        # key-validity select mask for the zero-padded frames >= F (their
        # values are explicit zeros, so masked softmax stays NaN-free)
        vmask = None
        if Fp != F:
            c = jax.lax.broadcasted_iota(jnp.int32, (Fp, Fp), 1)
            vmask = c < F
        g_full = J // kt
        if g_full:
            def body(i, c):
                temporal_group(src_ref, params, gate_here, i * (kt * C),
                               kt, vmask)
                return c

            jax.lax.fori_loop(0, g_full, body, 0)
        for j0 in range(g_full * kt, J):  # leftover joints (J % kt)
            temporal_group(src_ref, params, gate_here, j0 * C, 1, vmask)

    run = {"s": spatial_pass, "t": temporal_pass}
    run[order[0]](x_ref, p1, False)
    run[order[1]](o_ref, p2, gated)


def _stream_pallas(x, other, p1, p2, wg, bg, num_heads, scale, order,
                   q8=False):
    """Launch the stream kernel. other/wg/bg of None -> ungated. p1/p2 are
    the raw 12-param pair tuples either way; q8 quantizes the four weight
    matrices per pair OUTSIDE the pallas_call (jit-hoistable, like
    pair_q8._q8_launch)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    gated = other is not None
    B, F, J, C = x.shape
    hidden = p1[8].shape[1]
    picked = _pick_stream_groups(F, J, C, hidden, x.dtype.itemsize,
                                 gated, q8)
    if picked is None:  # whole-clip residency exceeds the VMEM budget
        return _stream_pairs_fallback(x, other, p1, p2, wg, bg, num_heads,
                                      scale, order, q8)
    tf, ks, kt = picked
    x3 = x.reshape(B, F, J * C)
    x_spec = pl.BlockSpec((1, F, J * C), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(
        shape, lambda b: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    def param_ops(p):
        (ln1_s, ln1_b, wqkv, bqkv, wproj, bproj, ln2_s, ln2_b,
         w1, b1, w2, b2) = p
        if q8:
            from motionbert_tpu.ops.pair_q8 import quant_cols

            wqkv8, sqkv = quant_cols(wqkv)
            wproj8, sproj = quant_cols(wproj)
            w18, s1 = quant_cols(w1)
            w28, s2 = quant_cols(w2)
            arrs = [ln1_s.reshape(1, -1), ln1_b.reshape(1, -1),
                    wqkv8, sqkv, bqkv.reshape(1, -1),
                    wproj8, sproj, bproj.reshape(1, -1),
                    ln2_s.reshape(1, -1), ln2_b.reshape(1, -1),
                    w18, s1, b1.reshape(1, -1),
                    w28, s2, b2.reshape(1, -1)]
        else:
            arrs = [ln1_s.reshape(1, -1), ln1_b.reshape(1, -1), wqkv,
                    bqkv.reshape(1, -1), wproj, bproj.reshape(1, -1),
                    ln2_s.reshape(1, -1), ln2_b.reshape(1, -1), w1,
                    b1.reshape(1, -1), w2, b2.reshape(1, -1)]
        return [const(a.shape) for a in arrs], arrs

    s1_, a1 = param_ops(p1)
    s2_, a2 = param_ops(p2)
    in_specs = [x_spec] + ([x_spec] if gated else []) + s1_ + s2_
    inputs = [x3] + ([other.reshape(B, F, J * C)] if gated else []) \
        + a1 + a2
    if gated:
        in_specs += [const((C, 2)), const((C, 2)), const((1, 2))]
        inputs += [wg[:C], wg[C:], bg.reshape(1, -1)]

    out = pl.pallas_call(
        functools.partial(_stream_kernel, num_heads, scale, J, order,
                          gated, tf, ks, kt, C, q8),
        grid=(B,),
        in_specs=in_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((B, F, J * C), x.dtype),
        compiler_params=_vmem_params(28 << 20),
        interpret=not _on_tpu(),
    )(*inputs)
    return out.reshape(B, F, J, C)


def _stream_xla(x, other, p1, p2, wg, bg, num_heads, scale, order):
    """Reference composition: two pair sub-blocks + gate, all XLA."""
    mode1 = "spatial" if order[0] == "s" else "temporal"
    mode2 = "spatial" if order[1] == "s" else "temporal"
    y = _pair_xla(x, *p1, num_heads, scale, mode1)
    out = _pair_xla(y, *p2, num_heads, scale, mode2)
    if other is not None:
        out = _gate_xla(other.astype(out.dtype), out, wg, bg)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(25, 26, 27))
def fused_stream_block(x, ln1_sa, ln1_ba, wqkva, bqkva, wproja, bproja,
                       ln2_sa, ln2_ba, w1a, b1a, w2a, b2a,
                       ln1_sb, ln1_bb, wqkvb, bqkvb, wprojb, bprojb,
                       ln2_sb, ln2_bb, w1b, b1b, w2b, b2b,
                       num_heads, scale, order):
    """One DSTformer stream (two attention+MLP pairs, axis order `order`
    in {("s","t"), ("t","s")}) in one kernel. Params a/b belong to the
    first/second pass respectively, each in fused_pair_block's order."""
    p1 = (ln1_sa, ln1_ba, wqkva, bqkva, wproja, bproja, ln2_sa, ln2_ba,
          w1a, b1a, w2a, b2a)
    p2 = (ln1_sb, ln1_bb, wqkvb, bqkvb, wprojb, bprojb, ln2_sb, ln2_bb,
          w1b, b1b, w2b, b2b)
    return _stream_pallas(x, None, p1, p2, None, None, num_heads, scale,
                          order)


def _stream_fwd(*args):
    out = fused_stream_block(*args)
    return out, args[:25]


def _stream_bwd(num_heads, scale, order, res, g):
    x, *ps = res
    p1, p2 = tuple(ps[:12]), tuple(ps[12:])
    mode1 = "spatial" if order[0] == "s" else "temporal"
    mode2 = "spatial" if order[1] == "s" else "temporal"
    y = _pair_pallas(x, *p1, num_heads, scale, mode1)
    g2 = _pair_bwd_pallas(y, None, g, *p2, None, None, num_heads, scale,
                          mode2)
    g1 = _pair_bwd_pallas(x, None, g2["dx"], *p1, None, None, num_heads,
                          scale, mode1)
    keys = ("dls1", "dlb1", "dwqkv", "dbqkv", "dwproj", "dbproj", "dls2",
            "dlb2", "dw1", "db1", "dw2", "db2")
    return (g1["dx"],) + tuple(g1[k] for k in keys) \
        + tuple(g2[k] for k in keys)


fused_stream_block.defvjp(_stream_fwd, _stream_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(28, 29, 30))
def fused_gated_stream_block(x, other, ln1_sa, ln1_ba, wqkva, bqkva,
                             wproja, bproja, ln2_sa, ln2_ba, w1a, b1a,
                             w2a, b2a, ln1_sb, ln1_bb, wqkvb, bqkvb,
                             wprojb, bprojb, ln2_sb, ln2_bb, w1b, b1b,
                             w2b, b2b, wg, bg, num_heads, scale, order):
    """fused_stream_block + the layer's att_fuse gate against the twin
    stream `other` in the SAME kernel (reference DSTformer.py:340-351).
    wg: (2C, 2), rows [:C] scoring `other`; bg: (2,)."""
    p1 = (ln1_sa, ln1_ba, wqkva, bqkva, wproja, bproja, ln2_sa, ln2_ba,
          w1a, b1a, w2a, b2a)
    p2 = (ln1_sb, ln1_bb, wqkvb, bqkvb, wprojb, bprojb, ln2_sb, ln2_bb,
          w1b, b1b, w2b, b2b)
    return _stream_pallas(x, other, p1, p2, wg, bg, num_heads, scale,
                          order)


def _gated_stream_fwd(*args):
    out = fused_gated_stream_block(*args)
    return out, args[:28]


def _gated_stream_bwd(num_heads, scale, order, res, g):
    x, other, *ps = res
    p1, p2 = tuple(ps[:12]), tuple(ps[12:24])
    wg, bg = ps[24], ps[25]
    mode1 = "spatial" if order[0] == "s" else "temporal"
    mode2 = "spatial" if order[1] == "s" else "temporal"
    y = _pair_pallas(x, *p1, num_heads, scale, mode1)
    g2 = _pair_bwd_pallas(y, other, g, *p2, wg, bg, num_heads, scale,
                          mode2)
    g1 = _pair_bwd_pallas(x, None, g2["dx"], *p1, None, None, num_heads,
                          scale, mode1)
    keys = ("dls1", "dlb1", "dwqkv", "dbqkv", "dwproj", "dbproj", "dls2",
            "dlb2", "dw1", "db1", "dw2", "db2")
    return (g1["dx"], g2["dother"]) + tuple(g1[k] for k in keys) \
        + tuple(g2[k] for k in keys) + (g2["dwg"], g2["dbg"])


fused_gated_stream_block.defvjp(_gated_stream_fwd, _gated_stream_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(25, 26, 27))
def fused_stream_block_q8(x, ln1_sa, ln1_ba, wqkva, bqkva, wproja, bproja,
                          ln2_sa, ln2_ba, w1a, b1a, w2a, b2a,
                          ln1_sb, ln1_bb, wqkvb, bqkvb, wprojb, bprojb,
                          ln2_sb, ln2_bb, w1b, b1b, w2b, b2b,
                          num_heads, scale, order):
    """W8A8 forward of fused_stream_block (same signature, bf16/f32
    weights in; quantization internal — see ops.pair_q8 for the scheme).
    Combines the two opt-in levers: int8 projections AND the removed
    intra-stream HBM boundary; the halved weight residency also buys the
    group picker larger matmul groups. Backward: straight-through bf16
    (the chained pair backwards), as on the q8 pair path."""
    p1 = (ln1_sa, ln1_ba, wqkva, bqkva, wproja, bproja, ln2_sa, ln2_ba,
          w1a, b1a, w2a, b2a)
    p2 = (ln1_sb, ln1_bb, wqkvb, bqkvb, wprojb, bprojb, ln2_sb, ln2_bb,
          w1b, b1b, w2b, b2b)
    return _stream_pallas(x, None, p1, p2, None, None, num_heads, scale,
                          order, q8=True)


def _stream_q8_fwd(*args):
    out = fused_stream_block_q8(*args)
    return out, args[:25]


fused_stream_block_q8.defvjp(_stream_q8_fwd, _stream_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(28, 29, 30))
def fused_gated_stream_block_q8(x, other, ln1_sa, ln1_ba, wqkva, bqkva,
                                wproja, bproja, ln2_sa, ln2_ba, w1a, b1a,
                                w2a, b2a, ln1_sb, ln1_bb, wqkvb, bqkvb,
                                wprojb, bprojb, ln2_sb, ln2_bb, w1b, b1b,
                                w2b, b2b, wg, bg, num_heads, scale, order):
    """W8A8 forward of fused_gated_stream_block."""
    p1 = (ln1_sa, ln1_ba, wqkva, bqkva, wproja, bproja, ln2_sa, ln2_ba,
          w1a, b1a, w2a, b2a)
    p2 = (ln1_sb, ln1_bb, wqkvb, bqkvb, wprojb, bprojb, ln2_sb, ln2_bb,
          w1b, b1b, w2b, b2b)
    return _stream_pallas(x, other, p1, p2, wg, bg, num_heads, scale,
                          order, q8=True)


def _gated_stream_q8_fwd(*args):
    out = fused_gated_stream_block_q8(*args)
    return out, args[:28]


fused_gated_stream_block_q8.defvjp(_gated_stream_q8_fwd, _gated_stream_bwd)
