"""Actor-pool audio decode validation stage (target-only operator M10).

The reference has no audio path; BASELINE.json:6 requires "audio decoders
validating codec/bytes consistency" as a *stateful actor-pool stage*.  This
is the callable-class form for
``Dataset.map_batches(AudioDecodeValidator, concurrency=N, batch_size=B,
batch_format="pyarrow")`` — decoder tables/buffers are built once per actor
in ``__init__`` (SURVEY.md §2.4 ST5), per-batch work in ``__call__``.

The stage appends decode-result columns and never drops rows (violation
selection happens downstream in the stats/verdict kernel):

    _audio_ok:bool        container parsed and payload length consistent
    _audio_codec:string   container codec (null when undecodable)
    _audio_sr:int32       container sample rate
    _audio_dur_ms:float64 decoded duration in ms (n_samples / sr * 1000)

and, in full-decode mode, per-clip QA features (the audio-quality checks a
speech-data pipeline runs on every clip — silence and clipping detection
from framed RMS/spectral analysis, functions/audio_codec.audio_features):

    _audio_rms_db, _audio_clipping_ratio, _audio_silence_ratio: float64

Modes:
- header mode (default): O(header) container parse per row — validates
  magic, chunk structure, payload length, sample rate, duration.
- full decode (``full_decode=True``): additionally expands the payload to
  PCM (numpy) and rejects non-finite output. This is what the SNR fidelity
  tests exercise end-to-end.

Batches stay Arrow end-to-end; audio payloads are only materialized as
Python ``bytes`` row-by-row inside the actor (the container parse is
inherently per-record — this IS the stage that pays that cost, sized via
``batch_size`` so payload bytes x batch_size fits the actor heap).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ndap_data_validator_ray.functions import audio_codec as ac


class AudioDecodeValidator:
    """Callable class for an actor-pool ``map_batches`` stage."""

    def __init__(self, bytes_column: str = "bytes", full_decode: bool = False):
        self.bytes_column = bytes_column
        self.full_decode = full_decode
        # per-actor scratch state (built once; reference pattern ST5)
        self._decode = ac.decode
        self._sniff = ac.sniff_header

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.bytes_column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        ok = np.zeros(n, dtype=bool)
        codecs: list[str | None] = [None] * n
        srs = np.zeros(n, dtype=np.int32)
        dur_ms = np.full(n, np.nan, dtype=np.float64)
        valid_sr = np.zeros(n, dtype=bool)

        rms_db = np.full(n, np.nan, dtype=np.float64)
        clipping = np.full(n, np.nan, dtype=np.float64)
        silence = np.full(n, np.nan, dtype=np.float64)

        blobs = col.to_pylist()
        for i, blob in enumerate(blobs):
            if blob is None:
                continue
            if self.full_decode:
                try:
                    codec, sr, pcm = self._decode(blob)
                except ac.AudioDecodeError:
                    continue
                if not np.all(np.isfinite(pcm)):
                    continue
                n_samples = len(pcm)
                # spectral=False: the verdict only consumes rms/clipping/
                # silence; skipping the per-clip FFT halves stage CPU
                feats = ac.audio_features(pcm, sr, spectral=False)
                rms_db[i] = feats["rms_db"]
                clipping[i] = feats["clipping_ratio"]
                silence[i] = feats["silence_ratio"]
            else:
                hdr = self._sniff(blob)
                if hdr is None:
                    continue
                codec, sr, n_samples = hdr
            ok[i] = True
            codecs[i] = codec
            srs[i] = sr
            valid_sr[i] = True
            dur_ms[i] = n_samples / sr * 1000.0 if sr else float("nan")

        out = batch.append_column("_audio_ok", pa.array(ok)) \
            .append_column("_audio_codec", pa.array(codecs, pa.string())) \
            .append_column("_audio_sr", pa.array(srs, pa.int32(), mask=~valid_sr)) \
            .append_column("_audio_dur_ms", pa.array(dur_ms, pa.float64(), mask=np.isnan(dur_ms)))
        if self.full_decode:
            out = out.append_column("_audio_rms_db", pa.array(rms_db, pa.float64(), mask=np.isnan(rms_db))) \
                .append_column("_audio_clipping_ratio", pa.array(clipping, pa.float64(), mask=np.isnan(clipping))) \
                .append_column("_audio_silence_ratio", pa.array(silence, pa.float64(), mask=np.isnan(silence)))
        return out
