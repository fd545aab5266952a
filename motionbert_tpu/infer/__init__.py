def read_video_meta(vid_path: str):
    """(fps, (w, h)) of a video via imageio (shared by the wild CLIs)."""
    import imageio

    reader = imageio.get_reader(vid_path)
    meta = reader.get_meta_data()
    fps = meta.get("fps", 30.0)
    size = meta.get("size")
    reader.close()
    return fps, size
