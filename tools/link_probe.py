"""Characterize the host<->device link: latency, bandwidth, duplexing.

The corpus engine's throughput is link-bound in this environment
(PERFORMANCE.md); engineering it to the roofline requires a model of the
link: per-transfer fixed cost (round trips), size-dependent bandwidth,
and whether uploads/downloads/dispatches overlap.  This probe measures:

  1. transfer time vs size, up and down (fixed-cost + 1/bw fit),
  2. dispatch round-trip cost of a trivial jit,
  3. whether N in-flight async downloads complete faster than N
     serialized ones (transfer-manager pipelining through the tunnel).

Run manually from the repo root: python tools/link_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    out = {"backend": jax.default_backend()}

    # -- 1. transfer time vs size ---------------------------------------
    sizes = [1 << 14, 1 << 18, 1 << 21, 1 << 23, 1 << 25, 1 << 27]
    up, down = {}, {}
    base = jnp.zeros(max(sizes), jnp.uint8)  # warm allocator
    base.block_until_ready()
    for n in sizes:
        host = np.zeros(n, np.uint8)
        reps = 5 if n <= (1 << 23) else 3
        ts_u, ts_d = [], []
        for r in range(reps):
            host[0] = r  # fresh bytes; defeat dedup
            t = time.perf_counter()
            d = jax.device_put(host, dev)
            d.block_until_ready()
            ts_u.append(time.perf_counter() - t)
            d = (d + r).block_until_ready()  # fresh device bytes
            t = time.perf_counter()
            np.asarray(d)
            ts_d.append(time.perf_counter() - t)
        up[n] = min(ts_u)
        down[n] = min(ts_d)
    out["up_s_by_size"] = {str(k): round(v, 4) for k, v in up.items()}
    out["down_s_by_size"] = {str(k): round(v, 4) for k, v in down.items()}
    # crude fixed-cost estimate: time at 16 KB ~= pure round trip
    out["up_fixed_ms"] = round(up[1 << 14] * 1e3, 1)
    out["down_fixed_ms"] = round(down[1 << 14] * 1e3, 1)
    big = 1 << 27
    out["up_mb_s_big"] = round(big / up[big] / 1e6, 1)
    out["down_mb_s_big"] = round(big / down[big] / 1e6, 1)

    # -- 2. dispatch round trip -----------------------------------------
    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8, 128), jnp.int32)
    f(x).block_until_ready()
    ts = []
    for _ in range(10):
        t = time.perf_counter()
        f(x).block_until_ready()
        ts.append(time.perf_counter() - t)
    out["dispatch_rt_ms"] = round(min(ts) * 1e3, 1)

    # -- 3. pipelining: N async downloads vs N serial -------------------
    n, nbuf = 1 << 23, 6  # 8 MB x 6
    bufs = [(base[:n] + i).block_until_ready() for i in range(nbuf)]
    t = time.perf_counter()
    for b in bufs:
        np.asarray(b)
    serial = time.perf_counter() - t
    bufs = [(base[:n] + 100 + i).block_until_ready() for i in range(nbuf)]
    t = time.perf_counter()
    for b in bufs:
        b.copy_to_host_async()
    arrs = [np.asarray(b) for b in bufs]
    overlapped = time.perf_counter() - t
    del arrs
    out["dl_serial_s"] = round(serial, 3)
    out["dl_async_s"] = round(overlapped, 3)

    # -- 4. duplex: concurrent up+down vs serialized --------------------
    import threading

    n = 1 << 25  # 32 MB each way
    host = np.zeros(n, np.uint8)
    host[0] = 1
    dbuf = (base[:n] + 7).block_until_ready()
    t = time.perf_counter()
    jax.device_put(host, dev).block_until_ready()
    np.asarray(dbuf)
    serial_2way = time.perf_counter() - t
    host[0] = 2
    dbuf = (base[:n] + 9).block_until_ready()
    res = {}

    def dl():
        res["d"] = np.asarray(dbuf)

    th = threading.Thread(target=dl)
    t = time.perf_counter()
    th.start()
    jax.device_put(host, dev).block_until_ready()
    th.join()
    duplex_2way = time.perf_counter() - t
    out["updown_serial_s"] = round(serial_2way, 3)
    out["updown_concurrent_s"] = round(duplex_2way, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
