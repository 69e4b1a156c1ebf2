"""Edge-of-contract tests: the remaining small validation branches the
main suites reach only implicitly — bad bit depths in the raw (un)pack
helpers, mono 1-D convenience input, direct RiffFormat validation, mesh
construction, and manifest robustness to a corrupt line.
"""

import json

import jax
import numpy as np
import pytest

from bjxa_tpu.errors import (
    BjxaBufferError,
    BjxaFault,
    BjxaInvalidState,
    BjxaIOError,
    BjxaProtocolError,
)


def test_encode_pcm_input_domain():
    from bjxa_tpu.api import decode_xa, encode_pcm

    with pytest.raises(BjxaInvalidState):
        encode_pcm(np.zeros((8, 1), np.int16), 44100, bits=5)
    with pytest.raises(BjxaIOError):
        encode_pcm(np.zeros((0, 1), np.int16), 44100, 6)
    with pytest.raises(BjxaInvalidState):
        encode_pcm(np.zeros((8, 3), np.int16), 44100, 6)
    # 1-D input is mono
    xa = encode_pcm(np.arange(40, dtype=np.int16) * 3, 44100, 8)
    fmt, pcm = decode_xa(xa)
    assert fmt.channels == 1 and pcm.shape == (40, 1)


def test_wav_to_xa_truncated_body():
    from bjxa_tpu.api import wav_to_xa
    from bjxa_tpu.format import dump_riff_header

    with pytest.raises(BjxaIOError):
        wav_to_xa(dump_riff_header(128, 44100, 1) + bytes(4))


def test_pcm_serialization_edges():
    from bjxa_tpu.format import load_pcm

    with pytest.raises(BjxaFault):
        load_pcm(None)
    with pytest.raises(BjxaBufferError):
        load_pcm(b"abc", 2)  # not a whole frame


def test_riff_validate_direct():
    from bjxa_tpu.format import dump_riff_header
    from bjxa_tpu.format.riff import RiffFormat

    with pytest.raises(BjxaProtocolError):
        RiffFormat(data_len_pcm=4, samples_rate=44100, channels=3).validate()
    with pytest.raises(BjxaProtocolError):
        RiffFormat(data_len_pcm=4, samples_rate=0, channels=1).validate()
    with pytest.raises(BjxaProtocolError):
        RiffFormat(
            data_len_pcm=4, samples_rate=44100, channels=1, sample_bits=8
        ).validate()
    with pytest.raises(BjxaProtocolError):
        RiffFormat(data_len_pcm=3, samples_rate=44100, channels=2).validate()
    with pytest.raises(BjxaFault):
        from bjxa_tpu.format import parse_riff_header

        parse_riff_header(None)
    with pytest.raises(BjxaProtocolError):
        dump_riff_header(64, 44100, 5)


def test_dump_xa_header_misuse():
    from bjxa_tpu.format import XAFormat, dump_xa_header

    with pytest.raises(BjxaFault):
        dump_xa_header(None)
    with pytest.raises(BjxaProtocolError):
        dump_xa_header(
            XAFormat(
                data_len=0,
                samples=0,
                samples_rate=44100,
                bits=6,
                channels=1,
                initial_state=((0, 0), (0, 0)),
            )
        )


def test_unpack_pack_bad_bits():
    import jax.numpy as jnp

    from bjxa_tpu.ops import numpy_ref
    from bjxa_tpu.ops.deflate import pack_payload
    from bjxa_tpu.ops.inflate import unpack_payload, unpack_payload_lanes

    with pytest.raises(ValueError):
        unpack_payload(jnp.zeros((1, 20), jnp.uint8), 5)
    with pytest.raises(ValueError):
        unpack_payload_lanes(jnp.zeros((1, 20, 1), jnp.uint8), 5)
    with pytest.raises(ValueError):
        pack_payload(jnp.zeros((1, 32), jnp.int32), 5)
    with pytest.raises(BjxaProtocolError):
        numpy_ref.pack_blocks(np.zeros((1, 32), np.int32), 5)
    with pytest.raises(BjxaProtocolError):
        numpy_ref.filter_block(
            np.zeros(32, np.int32), 0xF0, np.zeros(2, np.int32)
        )
    with pytest.raises(BjxaProtocolError):
        numpy_ref.decode_lanes_fixpoint(
            np.full((1, 1, 25), 0xFF, np.uint8), 6, np.zeros((1, 2), np.int32)
        )


def test_make_mesh_defaults():
    from bjxa_tpu.parallel.mesh import dp_sharding, make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh()  # all devices, dp inferred
    assert mesh.shape["dp"] * mesh.shape["sp"] == len(jax.devices())
    sh = dp_sharding(mesh, 3)
    assert sh.spec[0] == "dp"


def test_manifest_skips_corrupt_lines(tmp_path):
    from bjxa_tpu.utils.progress import Manifest

    path = tmp_path / "m.jsonl"
    path.write_text(
        json.dumps({"key": "a", "out": "x"}) + "\nnot json\n\n"
    )
    m = Manifest(path)
    assert m.is_done("a")
    assert not m.is_done("b")
