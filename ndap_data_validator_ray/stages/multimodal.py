"""Multimodal (image/video) actor-pool stages — REAL plumbing, STUBBED codecs.

Images/video are opaque ``binary`` columns with typed metadata, exactly like
audio (SURVEY.md §1.3).  The image/video decode libraries (Pillow, ffmpeg,
torchvision) are NOT in this container, so the codec layer is a
deterministic fake container (magic ``NDAPIMG``/``NDAPVID`` wrapping raw
uint8 arrays) clearly marked below; everything Ray-side — schema, actor
signature, batch sizing, violation/feature emission — is real and tested.
Swapping a real decoder only changes ``_decode_image``/``_decode_frames``.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_IMG_MAGIC = b"NDAPIMG\x00"
_VID_MAGIC = b"NDAPVID\x00"


def encode_fake_image(arr: np.ndarray) -> bytes:
    """DETERMINISTIC FAKE image container: magic + (h, w, c) + raw uint8."""
    h, w, c = arr.shape
    return _IMG_MAGIC + struct.pack("<III", h, w, c) + arr.astype(np.uint8).tobytes()


def _decode_image(blob: bytes) -> np.ndarray:
    """STUB decoder for the fake container.  A real deployment replaces this
    with e.g. ``PIL.Image.open`` — the surrounding stage is unchanged."""
    if blob[:8] != _IMG_MAGIC:
        raise ValueError("bad image magic")
    h, w, c = struct.unpack_from("<III", blob, 8)
    body = blob[20:]
    if len(body) != h * w * c:
        raise ValueError("image payload length mismatch")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, c)


def encode_fake_video(frames: np.ndarray) -> bytes:
    """DETERMINISTIC FAKE video container: magic + (n, h, w, c) + raw uint8."""
    n, h, w, c = frames.shape
    return _VID_MAGIC + struct.pack("<IIII", n, h, w, c) + frames.astype(np.uint8).tobytes()


def _decode_frames(blob: bytes) -> np.ndarray:
    if blob[:8] != _VID_MAGIC:
        raise ValueError("bad video magic")
    n, h, w, c = struct.unpack_from("<IIII", blob, 8)
    body = blob[24:]
    if len(body) != n * h * w * c:
        raise ValueError("video payload length mismatch")
    return np.frombuffer(body, dtype=np.uint8).reshape(n, h, w, c)


class ImageDecodeStage:
    """Actor-pool stage: decode + feature-extract + optional resize.

    Appends ``_img_ok``, ``_img_h``, ``_img_w``, ``_img_mean`` and (when
    ``resize_to`` is set) a ``_img_thumb`` binary column.  Keep
    ``batch_size`` small (64-256): image payloads dominate block size."""

    def __init__(self, bytes_col: str = "image", resize_to: tuple[int, int] | None = None):
        self.bytes_col = bytes_col
        self.resize_to = resize_to

    def _resize(self, img: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
        # nearest-neighbor resize in numpy (real impl would use PIL/opencv)
        h, w = hw
        ys = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
        xs = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
        return img[ys][:, xs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch[self.bytes_col].to_pylist()
        ok, hs_, ws_, means, thumbs = [], [], [], [], []
        for blob in blobs:
            try:
                img = _decode_image(blob)
            except (ValueError, TypeError, struct.error):
                ok.append(False)
                hs_.append(None)
                ws_.append(None)
                means.append(None)
                thumbs.append(None)
                continue
            ok.append(True)
            hs_.append(img.shape[0])
            ws_.append(img.shape[1])
            means.append(float(img.mean()))
            thumbs.append(
                encode_fake_image(self._resize(img, self.resize_to)) if self.resize_to else None
            )
        out = (
            batch.append_column("_img_ok", pa.array(ok, pa.bool_()))
            .append_column("_img_h", pa.array(hs_, pa.int32()))
            .append_column("_img_w", pa.array(ws_, pa.int32()))
            .append_column("_img_mean", pa.array(means, pa.float64()))
        )
        if self.resize_to:
            out = out.append_column("_img_thumb", pa.array(thumbs, pa.binary()))
        return out


class FrameSampleStage:
    """Actor-pool stage: sample every ``stride``-th frame from a video blob,
    emitting one row per sampled frame (flat_map-shaped via map_batches)."""

    def __init__(self, bytes_col: str = "video", id_col: str = "clip_id", stride: int = 10):
        self.bytes_col = bytes_col
        self.id_col = id_col
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out, frame_idx, frames_out = [], [], []
        ids = batch[self.id_col].to_pylist()
        for vid_id, blob in zip(ids, batch[self.bytes_col].to_pylist()):
            try:
                frames = _decode_frames(blob)
            except (ValueError, TypeError, struct.error):
                continue
            for i in range(0, frames.shape[0], self.stride):
                ids_out.append(vid_id)
                frame_idx.append(i)
                frames_out.append(encode_fake_image(frames[i]))
        return pa.table(
            {
                self.id_col: pa.array(ids_out, pa.string()),
                "frame_idx": pa.array(frame_idx, pa.int32()),
                "frame": pa.array(frames_out, pa.binary()),
            }
        )
