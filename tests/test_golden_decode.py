"""Golden bit-exactness: decoded WAVE output must hash identically to the
reference implementation's published SHA-1s (reference:
``test/test_decode.sh:24-78``), plus the handcrafted stereo saturation
vector driving int16 overflow/underflow (``test/test_decode.sh:80-122``).
"""

import hashlib

import pytest

from bjxa_tpu import xa_to_wav
from bjxa_tpu.format.hexdsl import hex_to_bytes

# (fixture file, sha1 of fixture, sha1 of decoded wav)
GOLDEN = [
    ("square-stereo-8.xa", "9fa9edf0ac468129c2e73523df55095a504b8d26",
     "4b10d39db9abfb75bb3561d7a789ca5afb046c75"),
    ("square-mono-8.xa", "9bdaa12181696bc61a4dfd562edb64a0def2f918",
     "1c7bdc2f42bd87ebaceb8184312a1857a9f6d8de"),
    ("square-stereo-6.xa", "5241ffdb22617621a6bd7ee9e16055ccb5f59875",
     "96eac5430bb7a73dc4801449684a4844b9b917c8"),
    ("square-mono-6.xa", "90749ddb703d17d408dd197ff6a877085b80331d",
     "ce3991eda98db098e45e876944d8324302726a66"),
    ("square-stereo-4.xa", "43e9ddd9afb8208f7bc84cea991fbcd27807a707",
     "35d8815e712737824c61a02f603145594c0827b7"),
    ("square-mono-4.xa", "02c7ec66ecebda313097462218d9dc05e8886806",
     "064c48434d77d41c7df3030f3e4a85972dcbac80"),
]

# Left channel overflows (ADPCM samples 0x7f all the way with high gain),
# right channel underflows (0x80 all the way): exercises the int16 clamp.
SATURATION_XA = """
4b574431 | KWD1 (id)
42000000 | 66 (nDataLen)
20000000 | 32 (nSamples)
44ac     | 44100 (nSamplesPerSec)
08       | 8 (nBits)
02       | 2 (nChannels)
00000000 | 0 (nLoopPtr)
0000     | 0 (befL[0])
0000     | 0 (befL[1])
0000     | 0 (befR[0])
0000     | 0 (befR[1])
00000000 | 0 (pad)
20       | block profile (high gain, low range)
7f7f7f7f | block data
7f7f7f7f | block data
7f7f7f7f | block data
7f7f7f7f | block data
7f7f7f7f | block data
7f7f7f7f | block data
7f7f7f7f | block data
7f7f7f7f | block data
20       | block profile (high gain, low range)
80808080 | block data
80808080 | block data
80808080 | block data
80808080 | block data
80808080 | block data
80808080 | block data
80808080 | block data
80808080 | block data
"""
SATURATION_WAV_SHA1 = "56ba3f62bf27ac9fd19cd97bcda06b4db327e612"


def sha1(data: bytes) -> str:
    return hashlib.sha1(data).hexdigest()


@pytest.mark.parametrize("name,xa_sha1,wav_sha1", GOLDEN)
def test_golden_fixture(fixture_dir, name, xa_sha1, wav_sha1):
    data = (fixture_dir / name).read_bytes()
    assert sha1(data) == xa_sha1, "fixture corpus integrity"
    wav = xa_to_wav(data)
    assert sha1(wav) == wav_sha1


def test_saturation_vector():
    wav = xa_to_wav(hex_to_bytes(SATURATION_XA))
    assert sha1(wav) == SATURATION_WAV_SHA1
