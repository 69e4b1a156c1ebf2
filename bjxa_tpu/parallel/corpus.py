"""Corpus engine: batched, sharded, restartable XA<->WAV conversion.

Scales the reference's one-file-at-a-time CLI to directories of files:

* files are parsed host-side, grouped by (bits, channels) and padded to
  block-count buckets so each batch is one static-shape device program;
* batches decode through :func:`bjxa_tpu.ops.decode.decode_batch` — on a
  multi-device mesh the file axis is sharded (data parallel, zero
  communication);
* batches run through a depth-k software pipeline: upcoming batches are
  staged and dispatched while earlier batches' PCM is still in flight
  from the device, overlapping host staging, device compute, and
  readback even over thin readback links;
* a JSONL manifest makes runs restartable per file (SURVEY §5
  checkpoint/resume); under ``jax.distributed`` each host processes its
  round-robin shard of the corpus (host-local file I/O, device-local
  compute — nothing crosses DCN but the optional metrics reduction).
"""

from __future__ import annotations

import dataclasses
import pathlib

import numpy as np

from bjxa_tpu.errors import BjxaError
from bjxa_tpu.format import (
    XA_HEADER_SIZE,
    dump_pcm,
    dump_riff_header,
    parse_xa_header,
)
from bjxa_tpu.ops.decode import (
    decode_batch_packed,
    packed_layout,
    pad_bucket as _bucket,
)
from bjxa_tpu.ops.tables import BLOCK_SAMPLES
from bjxa_tpu.utils.profiler import Counters
from bjxa_tpu.utils.progress import Manifest



class _SerialWriter:
    """One background thread running queued jobs in submission order.

    The corpus engines hand each materialized batch's serialization +
    disk writes to this thread so the main thread can immediately block
    on the next batch's device->host transfer; ordering is preserved so
    manifest/counter updates stay sequential.

    The queue is bounded (``maxsize=depth``): if disk writes fall behind
    decode+readback, ``put`` blocks the producer, so host memory holds at
    most ~depth materialized batches (matching the device-side bound the
    pipeline depth provides).  A job exception re-raises at the next
    ``put`` — the producer stops staging/decoding further batches
    promptly instead of burning device time on work that will never be
    written — or in ``__exit__`` if no put follows.  On a producer-side
    exception (including KeyboardInterrupt), ``__exit__`` discards the
    pending backlog instead of draining it — the manifest makes the rerun
    pick up exactly the unwritten files.
    """

    def __init__(self, depth: int = 3):
        import queue
        import threading

        self._q = queue.Queue(maxsize=max(depth, 1))
        self._exc = None
        self._abort = False
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while True:
            job = self._q.get()
            if job is None:
                return
            if self._abort or self._exc is not None:
                continue
            fn, args = job
            try:
                fn(*args)
            except BaseException as e:  # surfaced at next put / __exit__
                self._exc = e

    def put(self, fn, *args):
        if self._exc is not None:
            raise self._exc
        self._q.put((fn, args))

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, exc_type, exc, tb):
        if exc_type is not None:
            self._abort = True  # skip (don't run) the queued backlog
        self._q.put(None)
        self._thread.join()
        if exc_type is None and self._exc is not None:
            raise self._exc
        return False


def _start_readback(*arrays):
    """Begin device->host transfers now, without blocking.

    JAX only starts a D2H copy when the host materializes the array
    (``np.asarray``); calling ``copy_to_host_async`` at submit time lets
    the transfer run behind subsequent batches' staging and the writer
    thread, so the later ``np.asarray`` finds the bytes already landed.
    No-op for plain numpy results (the CPU-backend fallback).
    """
    for a in arrays:
        fn = getattr(a, "copy_to_host_async", None)
        if fn is not None:
            fn()


def _run_pipelined(groups, batch_files, submit, flush, depth: int = 3):
    """Software pipeline over grouped batches, ``depth`` batches in flight.

    Invariant: submit(batch i+k) happens BEFORE flush(batch i) so host
    staging + async device dispatch of upcoming batches overlap batch i's
    device compute and readback (JAX dispatch is asynchronous; flush's
    np.asarray blocks on the transfer).  ``depth`` bounds device-side
    queued batches so a slow consumer (e.g. a thin readback link) cannot
    accumulate unbounded device memory.
    """
    from collections import deque

    inflight: deque = deque()
    for key, items in sorted(groups.items()):
        # Every chunk of a group stages the same lane count (the group's
        # largest chunk) so the remainder chunk reuses the compiled
        # program; groups smaller than a full batch pad only to their own
        # size, not to batch_files (tiny corpora would otherwise ship
        # mostly-zero lanes over the host link).
        n_alloc = min(batch_files, len(items))
        for start in range(0, len(items), batch_files):
            chunk = items[start : start + batch_files]
            inflight.append(submit(*key, chunk, n_alloc))
            if len(inflight) >= max(depth, 1):
                flush(inflight.popleft())
    while inflight:
        flush(inflight.popleft())


def _resolve_process(process_index, process_count):
    """Fill unspecified process coordinates from the live JAX runtime."""
    if process_index is None or process_count is None:
        from bjxa_tpu.parallel.distributed import process_info

        auto_index, auto_count = process_info()
        if process_index is None:
            process_index = auto_index
        if process_count is None:
            process_count = auto_count
    return process_index, process_count


@dataclasses.dataclass
class CorpusResult:
    converted: int
    skipped: int
    failed: dict[str, str]
    counters: Counters


def decode_corpus(
    inputs,
    out_dir: str | pathlib.Path,
    *,
    batch_files: int = 64,
    bucket_granularity: int = 256,
    manifest_path: str | pathlib.Path | None = None,
    mesh=None,
    process_index: int | None = None,
    process_count: int | None = None,
    depth: int = 3,
) -> CorpusResult:
    """Decode every XA file in ``inputs`` to WAV files in ``out_dir``.

    ``inputs`` may be a directory or an iterable of paths.  Under
    ``jax.distributed`` (see :func:`bjxa_tpu.parallel.distributed.initialize`)
    each host auto-derives its round-robin shard of the sorted file list
    from ``jax.process_index()/count()``; passing ``process_index``/``count``
    explicitly overrides that (e.g. for externally-managed sharding).
    ``depth`` bounds both the in-flight device batches and the queued
    host-side write backlog.
    """
    process_index, process_count = _resolve_process(
        process_index, process_count
    )
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if isinstance(inputs, (str, pathlib.Path)) and pathlib.Path(inputs).is_dir():
        paths = sorted(pathlib.Path(inputs).glob("*.xa"))
    else:
        paths = [pathlib.Path(p) for p in inputs]
    paths = paths[process_index::process_count]

    manifest = Manifest(
        manifest_path
        if manifest_path is not None
        else out_dir / f".bjxa-manifest-{process_index}.jsonl"
    )

    counters = Counters()
    failed: dict[str, str] = {}
    skipped = 0
    converted = 0

    # ---- parse headers, group into (bits, channels, bucket) batches -----
    # Only headers are read here: payloads are (re)read at staging time,
    # so host memory is O(batch), not O(corpus).  Files whose payload +
    # PCM exceed the segmentation threshold never enter the batcher at
    # all — they stream through the bounded-memory segmented decoder.
    from bjxa_tpu.ops.decode import segment_threshold

    threshold = segment_threshold()
    groups: dict[tuple, list] = {}
    huge: list = []
    for path in paths:
        if manifest.is_done(str(path)):
            skipped += 1
            continue
        try:
            with open(path, "rb") as f:
                fmt = parse_xa_header(f.read(XA_HEADER_SIZE))
            if path.stat().st_size < XA_HEADER_SIZE + fmt.data_len:
                raise BjxaError("truncated payload")
        except (BjxaError, OSError) as e:
            failed[str(path)] = str(e)
            continue
        if fmt.data_len + fmt.data_len_pcm > threshold:
            huge.append((path, fmt))
            continue
        key = (fmt.bits, fmt.channels, _bucket(fmt.blocks, bucket_granularity))
        groups.setdefault(key, []).append((path, fmt))

    # ---- oversized files: segmented bounded-memory decode ---------------
    # With a (dp) mesh, the most expensive files would otherwise leave
    # every device but one idle: rebuild the same devices as an sp mesh
    # so each segment's block range shards over the ring instead.
    sp_mesh = None
    if mesh is not None and huge:
        from bjxa_tpu.parallel.mesh import make_mesh

        devs = list(mesh.devices.flat)
        if len(devs) > 1:
            sp_mesh = make_mesh(
                devs, dp=len(devs), sp=1, axis_names=("sp", "_")
            )
    for path, fmt in huge:
        out_path = out_dir / (path.stem + ".wav")
        tmp = out_path.with_suffix(".wav.tmp")
        try:
            from bjxa_tpu.api import decode_xa_stream

            with open(path, "rb") as fin, open(tmp, "wb") as fout:
                fin.seek(XA_HEADER_SIZE)
                decode_xa_stream(fin, fout, fmt, mesh=sp_mesh)
            tmp.replace(out_path)
        except (BjxaError, EOFError, OSError) as e:
            failed[str(path)] = str(e)
            tmp.unlink(missing_ok=True)
            continue
        manifest.record(str(path), out=str(out_path), samples=fmt.samples)
        converted += 1
        counters.files += 1
        counters.blocks += fmt.blocks
        counters.samples += fmt.samples * fmt.channels
        counters.bytes_in += fmt.data_len
        counters.bytes_out += fmt.data_len_pcm + 44

    # ---- decode each group in device batches ----------------------------
    # Depth-k software pipeline: upcoming batches are staged and
    # dispatched (JAX dispatch is asynchronous) before earlier results
    # are materialized and written, so host staging, device compute, and
    # device->host PCM transfer of several batches overlap.
    def _read_payload(path, fmt):
        with open(path, "rb") as f:
            f.seek(XA_HEADER_SIZE)
            payload = f.read(fmt.data_len)
        if len(payload) < fmt.data_len:
            raise BjxaError("truncated payload")
        return payload

    def submit(bits, channels, bucket, chunk, n_alloc):
        size = bits * 4 + 1
        L = n_alloc * channels
        # A file that shrank or vanished since the header parse degrades
        # per file: its lanes stay zero (valid profile-0 dummies) and the
        # writer skips it.
        dead = set()
        # The geometric bucket is only the GROUPING key; each chunk stages
        # and decodes at the finer linear granularity of its own largest
        # file.  On a link-bound engine the bucket's up-to-1/8 pad would
        # cross the link both ways; this caps the waste at <1 granularity
        # of blocks at the cost of at most a few extra compiles per group
        # (chunk maxima are granularity-aligned, so the distinct-shape
        # count stays small and the persistent compile cache absorbs it).
        bmax = max(f.blocks for _, f in chunk)
        Bs = min(bucket, -(-bmax // bucket_granularity) * bucket_granularity)
        if mesh is not None:
            # Sharded path: same packed-words staging as the single-device
            # path (words + profile bytes + states as three lane-sharded
            # arrays), flat per-shard PCM back (full-rate D2H).
            W = bits
            states = np.zeros((L, 2), np.int32)
            prof = np.zeros((Bs, L), np.uint8)
            words8 = np.zeros((Bs, W, L, 4), np.uint8)
            for i, (path, fmt) in enumerate(chunk):
                try:
                    payload = _read_payload(path, fmt)
                except (BjxaError, OSError) as e:
                    failed[str(path)] = str(e)
                    dead.add(i)
                    continue
                raw = np.frombuffer(
                    payload, np.uint8, count=fmt.blocks * fmt.block_size_xa
                ).reshape(fmt.blocks, channels, size)
                lanes = slice(i * channels, (i + 1) * channels)
                prof[: fmt.blocks, lanes] = raw[:, :, 0]
                words8[: fmt.blocks, :, lanes, :] = (
                    raw[:, :, 1:]
                    .reshape(fmt.blocks, channels, W, 4)
                    .transpose(0, 2, 1, 3)
                )
                states[lanes] = fmt.initial_state_array()
            words = words8.view("<i4")[..., 0]
            from bjxa_tpu.parallel.sharded import (
                decode_corpus_sharded_words,
            )

            # Validity is checked host-side from the staged profile plane
            # (the device result is not transferred back).
            valid = (prof >> 4) < 5
            pcm, reassemble = decode_corpus_sharded_words(
                prof, words, states, bits=bits, mesh=mesh
            )
            _start_readback(pcm)
            return channels, Bs, chunk, dead, (pcm, reassemble), valid

        # Single-device fast path: stage the whole batch into ONE packed
        # int32 buffer (payload words + profile bytes + predictor states,
        # see ops.decode.packed_layout) — one numpy copy, the same cost
        # as any staging layout, ONE host->device transfer, and the
        # device loads payload at int32 tiles with no per-sample uint8
        # convert.  Only the PCM comes back: validity is computed here
        # from the staged profile bytes, saving a device->host round trip
        # per batch on the link the corpus engine is bound by.
        W = bits  # 4*bits payload bytes == bits int32 words
        nw, npr, _nst = packed_layout(Bs, L, bits)
        buf = np.zeros(nw + npr + _nst, np.dtype("<i4"))
        words8 = buf[:nw].view(np.uint8).reshape(Bs, W, L, 4)
        prof = buf[nw : nw + npr].view(np.uint8)[: Bs * L].reshape(Bs, L)
        states = buf[nw + npr :].reshape(L, 2)
        for i, (path, fmt) in enumerate(chunk):
            try:
                payload = _read_payload(path, fmt)
            except (BjxaError, OSError) as e:
                failed[str(path)] = str(e)
                dead.add(i)
                continue
            raw = np.frombuffer(
                payload, np.uint8, count=fmt.blocks * fmt.block_size_xa
            ).reshape(fmt.blocks, channels, size)
            lanes = slice(i * channels, (i + 1) * channels)
            prof[: fmt.blocks, lanes] = raw[:, :, 0]
            words8[: fmt.blocks, :, lanes, :] = (
                raw[:, :, 1:]
                .reshape(fmt.blocks, channels, W, 4)
                .transpose(0, 2, 1, 3)
            )
            states[lanes] = fmt.initial_state_array()
        valid = (prof >> 4) < 5
        pcm = decode_batch_packed(buf, bits=bits, blocks=Bs, lanes=L)
        _start_readback(pcm)
        return channels, Bs, chunk, dead, pcm, valid

    def write_batch(channels, nblocks, chunk, dead, pcm, valid):
        nonlocal converted
        for i, (path, fmt) in enumerate(chunk):
            if i in dead:
                continue
            lanes = slice(i * channels, (i + 1) * channels)
            if not valid[: fmt.blocks, lanes].all():
                failed[str(path)] = "invalid block profile factor"
                continue
            frames = pcm[:, :, lanes].reshape(
                nblocks * BLOCK_SAMPLES, channels
            )[: fmt.samples]
            wav = dump_riff_header(
                fmt.data_len_pcm, fmt.samples_rate, fmt.channels
            ) + dump_pcm(frames)
            out_path = out_dir / (path.stem + ".wav")
            tmp = out_path.with_suffix(".wav.tmp")
            try:
                tmp.write_bytes(wav)
                tmp.replace(out_path)
            except OSError as e:
                # degrade per file, like parse errors — the run continues
                failed[str(path)] = str(e)
                continue
            manifest.record(
                str(path), out=str(out_path), samples=fmt.samples
            )
            converted += 1
            counters.files += 1
            counters.blocks += fmt.blocks
            counters.samples += fmt.samples * fmt.channels
            counters.bytes_in += fmt.data_len
            counters.bytes_out += len(wav)

    def flush(pending):
        channels, nblocks, chunk, dead, pcm, valid = pending
        # Both paths return flat 1-D PCM (full-rate transfer); the packed
        # path's reshape is a free numpy view, the mesh path's shard-major
        # reassembly is one host-memory copy (negligible vs the link).
        lanes_total = len(chunk) * channels
        if isinstance(pcm, tuple):
            pcm, reassemble = pcm
            pcm = reassemble(np.asarray(pcm))[:, :, :lanes_total]
        else:
            pcm = np.asarray(pcm)  # lands the (already-started) transfer
            pcm = pcm.reshape(nblocks, BLOCK_SAMPLES, -1)[:, :, :lanes_total]
        # WAV serialization + disk writes run on the writer thread so the
        # next batch's transfer is not stalled behind file I/O.
        writer.put(write_batch, channels, nblocks, chunk, dead, pcm, valid)

    with _SerialWriter(depth=depth) as writer:
        _run_pipelined(groups, batch_files, submit, flush, depth=depth)

    return CorpusResult(
        converted=converted,
        skipped=skipped,
        failed=failed,
        counters=counters.freeze(),
    )


def encode_corpus(
    inputs,
    out_dir: str | pathlib.Path,
    *,
    bits: int = 6,
    search: bool = True,
    batch_files: int = 64,
    bucket_granularity: int = 256,
    manifest_path: str | pathlib.Path | None = None,
    mesh=None,
    process_index: int | None = None,
    process_count: int | None = None,
    depth: int = 3,
) -> CorpusResult:
    """Encode every WAV file in ``inputs`` to XA files in ``out_dir``.

    The encoder analog of :func:`decode_corpus`: files group by
    (channels, block-count bucket), each batch runs the 80-profile search
    (or reference-compatible truncation) as one device program over
    ``files x channels`` lanes, and batches pipeline against host staging
    and packing.  On a multi-device ``mesh`` the lane axis shards over the
    data-parallel axis (zero communication).  Output bytes are identical
    to per-file :func:`bjxa_tpu.api.encode_pcm` — lanes never interact.
    """
    process_index, process_count = _resolve_process(
        process_index, process_count
    )
    import jax.numpy as jnp

    from bjxa_tpu.format import (
        RIFF_HEADER_SIZE,
        dump_xa_header,
        load_pcm,
        parse_riff_header,
    )
    from bjxa_tpu.format.xa import XAFormat
    from bjxa_tpu.ops.encode import encode_batch_blocks

    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if isinstance(inputs, (str, pathlib.Path)) and pathlib.Path(inputs).is_dir():
        paths = sorted(pathlib.Path(inputs).glob("*.wav"))
    else:
        paths = [pathlib.Path(p) for p in inputs]
    paths = paths[process_index::process_count]

    if manifest_path is None:
        manifest_path = (
            out_dir / f".bjxa-encode-manifest-{process_index}.jsonl"
        )
    manifest = Manifest(manifest_path)

    counters = Counters()
    failed: dict[str, str] = {}
    skipped = 0
    converted = 0

    # Only headers are read here (payloads re-read at staging time:
    # O(batch) host memory); oversized WAVs stream through the segmented
    # bounded-memory encoder instead of the batcher.
    from bjxa_tpu.ops.decode import segment_threshold

    threshold = segment_threshold()
    groups: dict[tuple, list] = {}
    huge: list = []
    for path in paths:
        if manifest.is_done(str(path)):
            skipped += 1
            continue
        try:
            with open(path, "rb") as f:
                rf = parse_riff_header(f.read(RIFF_HEADER_SIZE))
            if path.stat().st_size < RIFF_HEADER_SIZE + rf.data_len_pcm:
                raise BjxaError("truncated PCM payload")
        except (BjxaError, OSError) as e:
            failed[str(path)] = str(e)
            continue
        if rf.data_len_pcm > threshold:
            huge.append((path, rf))
            continue
        nblocks = -(-rf.samples // BLOCK_SAMPLES)
        key = (rf.channels, _bucket(nblocks, bucket_granularity))
        groups.setdefault(key, []).append((path, rf))

    # ---- oversized WAVs: segmented bounded-memory encode ----------------
    # (The search carries sequential state, so a single stream's encode
    # cannot shard across devices the way decode's ring does — its lanes
    # are only the channels; segments bound the memory, not the time.)
    from bjxa_tpu.api import encode_wav_stream

    for path, rf in huge:
        out_path = out_dir / (path.stem + ".xa")
        tmp = out_path.with_suffix(".xa.tmp")
        try:
            with open(path, "rb") as fin, open(tmp, "wb") as fout:
                fin.seek(RIFF_HEADER_SIZE)
                fmt = encode_wav_stream(
                    fin, fout, bits, search=search, rf=rf
                )
            tmp.replace(out_path)
        except (BjxaError, EOFError, OSError) as e:
            failed[str(path)] = str(e)
            tmp.unlink(missing_ok=True)
            continue
        manifest.record(str(path), out=str(out_path), samples=rf.samples)
        converted += 1
        counters.files += 1
        counters.blocks += fmt.blocks
        counters.samples += rf.samples * rf.channels
        counters.bytes_in += rf.data_len_pcm
        counters.bytes_out += fmt.data_len + 32

    def _read_pcm(path, rf):
        with open(path, "rb") as f:
            f.seek(RIFF_HEADER_SIZE)
            body = f.read(rf.data_len_pcm)
        if len(body) < rf.data_len_pcm:
            raise BjxaError("truncated PCM payload")
        return load_pcm(body, rf.channels)

    def submit(channels, bucket, chunk, n_alloc):
        # Fixed lane count per group (see decode_corpus.submit): the
        # remainder chunk reuses the full batch's compiled program.  The
        # bucket is only the grouping key — each chunk stages at the
        # linear granularity of its own largest file (less pad over the
        # link both ways).
        L = n_alloc * channels
        dead = set()
        bmax = max(
            -(-rf.samples // BLOCK_SAMPLES) for _, rf in chunk
        )
        Bs = min(bucket, -(-bmax // bucket_granularity) * bucket_granularity)
        lanes = np.zeros((Bs, BLOCK_SAMPLES, L), np.int16)
        frames = lanes.reshape(Bs * BLOCK_SAMPLES, L)
        for i, (path, rf) in enumerate(chunk):
            try:
                pcm = _read_pcm(path, rf)
            except (BjxaError, OSError) as e:
                failed[str(path)] = str(e)
                dead.add(i)
                continue
            ln = slice(i * channels, (i + 1) * channels)
            frames[: pcm.shape[0], ln] = pcm
        if mesh is not None:
            from bjxa_tpu.parallel.sharded import (
                encode_corpus_sharded_flat,
            )

            states0 = np.zeros((L, 2), np.int32)
            blocks, reassemble = encode_corpus_sharded_flat(
                lanes, states0, bits=bits, search=search, mesh=mesh
            )
            _start_readback(blocks)
            return channels, L, chunk, dead, (blocks, reassemble)
        # Single dispatch, single upload, single readback (the zero
        # initial state is synthesized on device; flat output transfers
        # at full link rate).
        blocks = encode_batch_blocks(
            jnp.asarray(lanes), bits=bits, search=search
        )  # flat uint8, host layout [Bs, L, S]
        _start_readback(blocks)
        return channels, L, chunk, dead, blocks

    def write_batch(channels, chunk, dead, blocks):
        nonlocal converted
        for i, (path, rf) in enumerate(chunk):
            if i in dead:
                continue
            ln = slice(i * channels, (i + 1) * channels)
            nblocks = -(-rf.samples // BLOCK_SAMPLES)
            payload = np.ascontiguousarray(
                blocks[:nblocks, ln]
            ).tobytes()
            fmt = XAFormat(
                data_len=len(payload),
                samples=rf.samples,
                samples_rate=rf.samples_rate,
                bits=bits,
                channels=channels,
                initial_state=((0, 0), (0, 0)),
            )
            xa = dump_xa_header(fmt) + payload
            out_path = out_dir / (path.stem + ".xa")
            tmp = out_path.with_suffix(".xa.tmp")
            try:
                tmp.write_bytes(xa)
                tmp.replace(out_path)
            except OSError as e:
                failed[str(path)] = str(e)
                continue
            manifest.record(
                str(path), out=str(out_path), samples=rf.samples
            )
            converted += 1
            counters.files += 1
            counters.blocks += nblocks
            counters.samples += rf.samples * channels
            counters.bytes_in += rf.data_len_pcm
            counters.bytes_out += len(xa)

    def flush(pending):
        channels, L, chunk, dead, blocks = pending
        # Both paths return flat bytes; the packed path's reshape is a
        # free view, the mesh path's shard-major reassembly one host copy.
        if isinstance(blocks, tuple):
            blocks, reassemble = blocks
            blocks = reassemble(np.asarray(blocks))
        else:
            blocks = np.asarray(blocks).reshape(-1, L, bits * 4 + 1)
        writer.put(write_batch, channels, chunk, dead, blocks)

    with _SerialWriter(depth=depth) as writer:
        _run_pipelined(groups, batch_files, submit, flush, depth=depth)

    return CorpusResult(
        converted=converted,
        skipped=skipped,
        failed=failed,
        counters=counters.freeze(),
    )
