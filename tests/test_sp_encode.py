"""Sequence-parallel single-stream ENCODE on the virtual 8-device CPU
mesh: the ppermute boundary-state ring composed with the greedy
80-profile search (:func:`bjxa_tpu.parallel.sharded.encode_file_sharded`),
verified byte-identical to the sequential greedy search through every
layer it is wired into — the core, ``api.encode_pcm(mesh=)``,
``iter_encode_segments(mesh=)`` and the CLI's ``--devices`` flag.

The decode mirror lives in ``tests/test_parallel.py::test_file_sp``;
reference anchor for the mirrored capability is the symmetric streaming
encode driver ``src/bjxa_encode.c:108-160``.
"""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bjxa_tpu.ops.deflate import deflate_blocks
from bjxa_tpu.ops.encode import encode_search_scan, iter_encode_segments
from bjxa_tpu.parallel.mesh import make_mesh
from bjxa_tpu.parallel.sharded import encode_file_sharded


@pytest.fixture(scope="module")
def sp_mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(devs, dp=8, sp=1, axis_names=("sp", "_"))


def music(rng, nblocks, channels, amp=12000):
    """Tonal signal + noise: exercises real filter-profile choices."""
    t = np.linspace(0, 40 * np.pi, nblocks * 32 * channels)
    pcm = amp * np.sin(t) + rng.integers(-3000, 3000, t.size)
    return pcm.astype(np.int32).reshape(nblocks, 32, channels)


def sequential_reference(pcm, state, bits):
    prof, coded, recon, _end = encode_search_scan(
        jnp.asarray(pcm), jnp.asarray(state), bits=bits
    )
    blocks = np.asarray(deflate_blocks(prof, coded.transpose(0, 2, 1), bits))
    rr = np.asarray(recon)
    end = np.stack([rr[-1, -1], rr[-1, -2]], axis=-1).astype(np.int32)
    return blocks, end


@pytest.mark.parametrize(
    "channels,bits,nblocks",
    [(2, 6, 200), (1, 4, 97), (2, 8, 256)],
)
def test_encode_file_sharded_bitexact(sp_mesh, channels, bits, nblocks):
    rng = np.random.default_rng(nblocks + bits)
    pcm = music(rng, nblocks, channels)
    state = rng.integers(-200, 200, (channels, 2)).astype(np.int32)
    ref_blocks, ref_end = sequential_reference(pcm, state, bits)
    blocks, end, rounds = encode_file_sharded(
        pcm, state, bits=bits, mesh=sp_mesh, local_chunks=3
    )
    np.testing.assert_array_equal(blocks, ref_blocks)
    np.testing.assert_array_equal(end, ref_end)
    assert 1 <= rounds <= 8


def test_encode_file_sharded_b_total_trim(sp_mesh):
    """Bucket-padded input: outputs trim to b_total and the carried state
    reads after the last REAL block, not the pad."""
    rng = np.random.default_rng(5)
    B, pad_to = 90, 128
    pcm = music(rng, pad_to, 2)
    pcm[B:] = 0  # bucket pad blocks
    state = np.zeros((2, 2), np.int32)
    ref_blocks, ref_end = sequential_reference(pcm[:B], state, 6)
    blocks, end, _rounds = encode_file_sharded(
        pcm, state, bits=6, mesh=sp_mesh, local_chunks=2, b_total=B
    )
    np.testing.assert_array_equal(blocks, ref_blocks)
    np.testing.assert_array_equal(end, ref_end)


def test_encode_pcm_mesh_byte_identity(sp_mesh):
    from bjxa_tpu.api import encode_pcm

    rng = np.random.default_rng(11)
    samples = 150 * 32 - 7  # partial final block
    pcm = (
        (9000 * np.sin(np.linspace(0, 9 * np.pi, samples * 2)))
        .astype(np.int16).reshape(samples, 2)
    )
    ref = encode_pcm(pcm, 44100, 6)
    got = encode_pcm(pcm, 44100, 6, mesh=sp_mesh, sp_min_blocks=64)
    assert got == ref
    # below the threshold the mesh is ignored (single-dispatch path)
    assert encode_pcm(pcm, 44100, 6, mesh=sp_mesh) == ref


def test_iter_encode_segments_mesh(sp_mesh):
    """Segmented encode over the ring: byte-identical to the one-shot
    encoder with the search state carried exactly across segments."""
    rng = np.random.default_rng(21)
    nblocks, C, bits = 200, 2, 6
    pcm = music(rng, nblocks, C)
    ref_blocks, _ = sequential_reference(pcm, np.zeros((C, 2), np.int32), bits)
    body = np.ascontiguousarray(pcm.reshape(-1, C)).astype("<i2").tobytes()
    parts = list(
        iter_encode_segments(
            io.BytesIO(body).read,
            C,
            nblocks * 32,
            bits=bits,
            search=True,
            segment_blocks=48,
            mesh=sp_mesh,
        )
    )
    assert b"".join(parts) == ref_blocks.tobytes()


def test_iter_encode_segments_mesh_truncated(sp_mesh):
    """A truncated PCM stream still yields the whole-block prefix before
    EOFError on the mesh path, matching the single-device contract."""
    rng = np.random.default_rng(23)
    nblocks, C = 96, 2
    pcm = music(rng, nblocks, C)
    body = np.ascontiguousarray(pcm.reshape(-1, C)).astype("<i2").tobytes()
    cut = body[: (64 * 32 + 11) * 2 * C]  # 64 whole blocks + a partial
    ref_blocks, _ = sequential_reference(
        pcm[:64], np.zeros((C, 2), np.int32), 6
    )
    got = []
    with pytest.raises(EOFError):
        for part in iter_encode_segments(
            io.BytesIO(cut).read,
            C,
            nblocks * 32,
            bits=6,
            search=True,
            segment_blocks=48,
            mesh=sp_mesh,
        ):
            got.append(part)
    assert b"".join(got) == ref_blocks.tobytes()


def test_cli_encode_devices(sp_mesh):
    """CLI --devices on encode: the segmented multi-device encode emits
    bytes identical to the single-device one-shot encoder."""
    from bjxa_tpu.api import wav_to_xa
    from bjxa_tpu.format import dump_riff_header

    from tests.test_cli import run_cli

    rng = np.random.default_rng(31)
    pcm = music(rng, 120, 2, amp=8000).reshape(-1, 2).astype("<i2")
    wav = dump_riff_header(pcm.nbytes, 44100, 2) + pcm.tobytes()
    ref = wav_to_xa(wav, 6)
    code, out, err = run_cli(
        ["encode", "--devices", "8", "--segment-blocks", "48", "-", "-"],
        stdin=wav,
    )
    assert code == 0, err
    assert out == ref
