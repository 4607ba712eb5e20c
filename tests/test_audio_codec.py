import numpy as np
import pytest

from ndap_data_validator_ray.functions import audio_codec as ac


@pytest.mark.parametrize("codec", ac.CODECS)
@pytest.mark.parametrize("sr", [8000, 44100])
def test_roundtrip_snr(codec, sr):
    pcm = ac.synth_pcm(11, sr, sr // 2)
    blob = ac.encode(pcm, sr, codec)
    got_codec, got_sr, got_pcm = ac.decode(blob)
    assert got_codec == codec and got_sr == sr and len(got_pcm) == len(pcm)
    # per-row fidelity invariant (BASELINE.json:15): SNR >= 30 dB
    assert ac.snr_db(pcm, got_pcm) >= 30.0


@pytest.mark.parametrize("codec", ac.CODECS)
def test_sniff_header_matches_decode(codec):
    pcm = ac.synth_pcm(3, 16000, 4000)
    blob = ac.encode(pcm, 16000, codec)
    assert ac.sniff_header(blob) == (codec, 16000, 4000)


def test_synth_deterministic():
    a = ac.synth_pcm(5, 16000, 1000)
    b = ac.synth_pcm(5, 16000, 1000)
    assert np.array_equal(a, b)
    c = ac.synth_pcm(6, 16000, 1000)
    assert not np.array_equal(a, c)


@pytest.mark.parametrize(
    "blob",
    [
        b"",
        b"JUNKJUNKJUNKJUNK" * 4,
        b"RIFF\x10\x00\x00\x00WAVEfmt ",
    ],
)
def test_corrupt_rejected(blob):
    with pytest.raises(ac.AudioDecodeError):
        ac.decode(blob)
    assert ac.sniff_header(blob) is None


def test_truncated_rejected():
    blob = ac.encode(ac.synth_pcm(1, 8000, 800), 8000, "pcm_s16le")
    for cut in (len(blob) // 3, len(blob) - 1):
        with pytest.raises(ac.AudioDecodeError):
            ac.decode(blob[:cut])
        assert ac.sniff_header(blob[:cut]) is None
