"""Deterministic audio synthesis + encode/decode kernels (pure numpy).

The target table (BASELINE.json:15) carries encoded audio as an opaque
``binary`` column next to declared metadata (``sr_hz``, ``dur_ms``,
``codec``).  The engine must *validate codec/bytes consistency* (decode the
payload, check the container's sample rate / duration / codec against the
declared columns) and — in tests — verify per-row fidelity: decoded PCM
allclose to the oracle synth with SNR >= 30 dB.

Codecs implemented here (no external audio libraries exist in this
container, so everything is self-contained numpy):

- ``pcm_s16le`` — canonical RIFF/WAVE container, format code 1, int16 LE.
- ``ulaw``      — RIFF/WAVE container, format code 7, continuous mu-law
                  companding (mu=255).  ~38 dB SNR: above the 30 dB gate.
- ``alaw``      — RIFF/WAVE container, format code 6, continuous A-law
                  companding (A=87.6).  ~37 dB SNR.
- ``opus``      — DETERMINISTIC FAKE.  Real Opus needs libopus, which is not
                  in this container; the stand-in container (magic
                  ``NDAPFAKEOPUS``) wraps int16 PCM so that the Ray-side
                  plumbing (schema, actor signature, batch sizing, violation
                  emission) is real and tested.  Swapping in a real decoder
                  only changes `_decode_fake_opus`.

The mu-law / A-law transforms are the continuous companding formulas (self-
consistent encoder/decoder pair), not bit-exact G.711 segment tables — the
engine only ever decodes payloads produced by this module or rejects them.

All functions are vectorized and deterministic (seeded ``default_rng``);
no wall-clock, no I/O.
"""

from __future__ import annotations

import struct

import numpy as np

# WAVE format codes (public RIFF/WAVE spec)
_WAVE_FMT_PCM = 1
_WAVE_FMT_ALAW = 6
_WAVE_FMT_ULAW = 7

_FAKE_OPUS_MAGIC = b"NDAPFAKEOPUS"

CODECS = ("pcm_s16le", "ulaw", "alaw", "opus")

_MU = 255.0
_A = 87.6


class AudioDecodeError(ValueError):
    """Raised when a payload cannot be decoded (corrupt container)."""


# ---------------------------------------------------------------------------
# Deterministic synthesis
# ---------------------------------------------------------------------------

def synth_pcm(clip_index: int, sr_hz: int, n_samples: int, seed: int = 42) -> np.ndarray:
    """Deterministic float64 PCM in (-1, 1): two sines + low noise.

    Seeded per clip by ``seed ^ clip_index`` (FIXTURES.md F1) so any worker
    (or the test oracle) can regenerate the exact reference signal without
    shipping it.
    """
    rng = np.random.default_rng(np.uint64(seed) ^ np.uint64(clip_index))
    f1 = float(rng.uniform(80.0, min(3500.0, sr_hz / 2.5)))
    f2 = float(rng.uniform(80.0, min(3500.0, sr_hz / 2.5)))
    a1 = float(rng.uniform(0.25, 0.45))
    a2 = float(rng.uniform(0.1, 0.25))
    t = np.arange(n_samples, dtype=np.float64) / float(sr_hz)
    x = a1 * np.sin(2 * np.pi * f1 * t) + a2 * np.sin(2 * np.pi * f2 * t)
    x += rng.normal(0.0, 0.003, n_samples)
    return np.clip(x, -0.999, 0.999)


# ---------------------------------------------------------------------------
# Companding (vectorized)
# ---------------------------------------------------------------------------

def _ulaw_compress(x: np.ndarray) -> np.ndarray:
    y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
    return np.round((y + 1.0) * 127.5).astype(np.uint8)


def _ulaw_expand(code: np.ndarray) -> np.ndarray:
    y = code.astype(np.float64) / 127.5 - 1.0
    return np.sign(y) * ((1.0 + _MU) ** np.abs(y) - 1.0) / _MU


def _alaw_compress(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    denom = 1.0 + np.log(_A)
    y = np.where(ax < 1.0 / _A, _A * ax / denom, (1.0 + np.log(_A * np.clip(ax, 1.0 / _A, None))) / denom)
    y = np.sign(x) * y
    return np.round((y + 1.0) * 127.5).astype(np.uint8)


def _alaw_expand(code: np.ndarray) -> np.ndarray:
    y = code.astype(np.float64) / 127.5 - 1.0
    ay = np.abs(y)
    denom = 1.0 + np.log(_A)
    x = np.where(ay < 1.0 / denom, ay * denom / _A, np.exp(ay * denom - 1.0) / _A)
    return np.sign(y) * x


# ---------------------------------------------------------------------------
# Containers
# ---------------------------------------------------------------------------

def _wav_bytes(payload: bytes, sr_hz: int, fmt_code: int, bits: int) -> bytes:
    block_align = bits // 8
    byte_rate = sr_hz * block_align
    fmt = struct.pack("<HHIIHH", fmt_code, 1, sr_hz, byte_rate, block_align, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode(pcm: np.ndarray, sr_hz: int, codec: str) -> bytes:
    """Encode float PCM in (-1,1) to the named codec's container bytes."""
    if codec == "pcm_s16le":
        payload = np.round(pcm * 32767.0).astype("<i2").tobytes()
        return _wav_bytes(payload, sr_hz, _WAVE_FMT_PCM, 16)
    if codec == "ulaw":
        return _wav_bytes(_ulaw_compress(pcm).tobytes(), sr_hz, _WAVE_FMT_ULAW, 8)
    if codec == "alaw":
        return _wav_bytes(_alaw_compress(pcm).tobytes(), sr_hz, _WAVE_FMT_ALAW, 8)
    if codec == "opus":
        payload = np.round(pcm * 32767.0).astype("<i2").tobytes()
        return _FAKE_OPUS_MAGIC + struct.pack("<IQ", sr_hz, len(pcm)) + payload
    raise ValueError(f"unknown codec: {codec!r}")


def decode(data: bytes) -> tuple[str, int, np.ndarray]:
    """Decode container bytes -> (codec, sr_hz, float64 pcm).

    Raises AudioDecodeError on any structural corruption (bad magic,
    truncated chunks, unknown format code, length mismatch).
    """
    if data[:12] == _FAKE_OPUS_MAGIC:
        return _decode_fake_opus(data)
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AudioDecodeError("bad container magic")
    riff_len = struct.unpack_from("<I", data, 4)[0]
    if riff_len + 8 != len(data):
        raise AudioDecodeError("RIFF length mismatch")
    pos, fmt_code, sr_hz, bits, payload = 12, None, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        clen = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise AudioDecodeError("truncated chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise AudioDecodeError("short fmt chunk")
            fmt_code, _nch, sr_hz, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            payload = body
        pos += 8 + clen
    if fmt_code is None or payload is None:
        raise AudioDecodeError("missing fmt/data chunk")
    if fmt_code == _WAVE_FMT_PCM and bits == 16:
        pcm = np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32767.0
        return "pcm_s16le", int(sr_hz), pcm
    if fmt_code == _WAVE_FMT_ULAW and bits == 8:
        return "ulaw", int(sr_hz), _ulaw_expand(np.frombuffer(payload, dtype=np.uint8))
    if fmt_code == _WAVE_FMT_ALAW and bits == 8:
        return "alaw", int(sr_hz), _alaw_expand(np.frombuffer(payload, dtype=np.uint8))
    raise AudioDecodeError(f"unsupported wave format code {fmt_code}/{bits}bit")


def _decode_fake_opus(data: bytes) -> tuple[str, int, np.ndarray]:
    if len(data) < 12 + 12:
        raise AudioDecodeError("truncated fake-opus header")
    sr_hz, n = struct.unpack_from("<IQ", data, 12)
    payload = data[24:]
    if len(payload) != 2 * n:
        raise AudioDecodeError("fake-opus payload length mismatch")
    pcm = np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32767.0
    return "opus", int(sr_hz), pcm


def sniff_header(data: bytes) -> tuple[str, int, int] | None:
    """Cheap header-only probe -> (codec, sr_hz, n_samples) or None.

    Used by the fast validation path: O(bytes) decode is only needed for
    fidelity; consistency checks (declared sr/dur vs container) need only
    the header. Returns None when the container is corrupt.
    """
    try:
        if data[:12] == _FAKE_OPUS_MAGIC:
            if len(data) < 24:
                return None
            sr_hz, n = struct.unpack_from("<IQ", data, 12)
            if len(data) - 24 != 2 * n:
                return None
            return "opus", int(sr_hz), int(n)
        if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
            return None
        if struct.unpack_from("<I", data, 4)[0] + 8 != len(data):
            return None
        fmt_code, sr_hz, bits, data_len = None, None, None, None
        pos = 12
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            clen = struct.unpack_from("<I", data, pos + 4)[0]
            if pos + 8 + clen > len(data):
                return None
            if cid == b"fmt ":
                fmt_code, _nch, sr_hz, _br, _ba, bits = struct.unpack_from("<HHIIHH", data, pos + 8)
            elif cid == b"data":
                data_len = clen
            pos += 8 + clen
        if fmt_code is None or data_len is None:
            return None
        if fmt_code == _WAVE_FMT_PCM and bits == 16:
            return "pcm_s16le", int(sr_hz), data_len // 2
        if fmt_code == _WAVE_FMT_ULAW and bits == 8:
            return "ulaw", int(sr_hz), data_len
        if fmt_code == _WAVE_FMT_ALAW and bits == 8:
            return "alaw", int(sr_hz), data_len
        return None
    except (struct.error, IndexError):
        return None


def snr_db(reference: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of ``test`` against ``reference`` in dB."""
    if len(reference) != len(test):
        return float("-inf")
    noise = reference - test
    p_sig = float(np.mean(reference**2))
    p_noise = float(np.mean(noise**2))
    if p_noise == 0.0:
        return float("inf")
    return 10.0 * np.log10(p_sig / p_noise)


# ---------------------------------------------------------------------------
# Audio QA features (vectorized numpy; used by the decode-validation stage)
# ---------------------------------------------------------------------------

_FRAME = 512
_HOP = 128
_EPS = 1e-12
_HANN = np.hanning(_FRAME)  # built once per process, not per clip

SILENCE_RMS_DB = -50.0  # clip-level silence threshold
CLIPPING_RATIO_MAX = 0.01  # fraction of near-full-scale samples allowed


def audio_features(pcm: np.ndarray, sr_hz: int, spectral: bool = True) -> dict:
    """Quality features of one decoded clip: RMS level, peak, clipping
    ratio, framed silence ratio, zero-crossing rate and — when
    ``spectral=True`` — dominant frequency and spectral flatness (framed
    Hann FFT).  All deterministic numpy — this is the compute body of the
    actor-pool validation stage.

    The validation stage only consumes rms_db / clipping_ratio /
    silence_ratio, none of which needs an FFT, so it calls with
    ``spectral=False`` — the framed RMS runs on a zero-copy strided view
    and the per-clip FFT (the single biggest cost at ~0.3ms/clip) is
    skipped entirely; spectral values come back as NaN then."""
    n = len(pcm)
    if n == 0:
        return {
            "rms_db": float("-inf"), "peak": 0.0, "clipping_ratio": 0.0,
            "silence_ratio": 1.0, "zcr": 0.0, "dominant_freq_hz": 0.0,
            "spectral_flatness": 1.0,
        }
    rms = float(np.sqrt(np.mean(pcm * pcm)))
    peak = float(np.max(np.abs(pcm)))
    clipping = float(np.mean(np.abs(pcm) >= 0.985))
    zcr = float(np.mean(np.signbit(pcm[1:]) != np.signbit(pcm[:-1])))

    dominant = float("nan")
    flatness = float("nan")
    if n >= _FRAME:
        frames = np.lib.stride_tricks.sliding_window_view(pcm, _FRAME)[::_HOP]
        # einsum over the strided view: framed energy without materializing
        # frames or a frames**2 temp
        frame_rms = np.sqrt(np.einsum("ij,ij->i", frames, frames) / _FRAME)
        silence_ratio = float(np.mean(20 * np.log10(frame_rms + _EPS) < SILENCE_RMS_DB))
        if spectral:
            spec = np.abs(np.fft.rfft(frames * _HANN, axis=1))
            mean_spec = spec.mean(axis=0) + _EPS
            dominant = float(np.argmax(mean_spec[1:]) + 1) * sr_hz / _FRAME
            flatness = float(np.exp(np.mean(np.log(mean_spec))) / np.mean(mean_spec))
    else:
        silence_ratio = 1.0 if 20 * np.log10(rms + _EPS) < SILENCE_RMS_DB else 0.0
        if spectral:
            dominant = 0.0
            flatness = 1.0

    return {
        "rms_db": 20 * np.log10(rms + _EPS),
        "peak": peak,
        "clipping_ratio": clipping,
        "silence_ratio": silence_ratio,
        "zcr": zcr,
        "dominant_freq_hz": dominant,
        "spectral_flatness": flatness,
    }
