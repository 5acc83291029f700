"""Interleaved A/B of two plan-builder .so builds (same process, same
buffers) — the only timing methodology that survives this host's ~30%
external-load swings (CLAUDE.md). Usage:

    python experiments/plan_ab.py OLD.so NEW.so [corpus] [iters]

OLD defaults to old-ABI detection by symbol probing: a build whose
tlz4_build_ring_plan2 still takes the global depth scratch pointer gets it
appended. Pass "-" for OLD to time NEW alone. corpus: text|mixed.
"""
import ctypes
import glob
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

i32p = ctypes.POINTER(ctypes.c_int32)
u8p = ctypes.POINTER(ctypes.c_uint8)
i64p = ctypes.POINTER(ctypes.c_int64)

# builds at-or-after the depth-localization change take 22 args; before: 23
NEW_ABI_NARGS = 22


def mk(path, old_abi):
    lib = ctypes.CDLL(path)
    f = lib.tlz4_build_ring_plan2
    f.restype = ctypes.c_int64
    base = (
        [u8p, ctypes.c_size_t, i64p, i64p, u8p]
        + [ctypes.c_int32] * 2
        + [ctypes.c_int64]
        + [ctypes.c_int32] * 8
        + [i32p] * 5
        + [u8p]
    )
    f.argtypes = base + ([u8p, i64p] if old_abi else [i64p])
    return f


def main():
    old_path = sys.argv[1] if len(sys.argv) > 1 else "-"
    new_path = sys.argv[2] if len(sys.argv) > 2 else None
    corpus = sys.argv[3] if len(sys.argv) > 3 else "text"
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 14
    if new_path is None:
        cands = sorted(
            glob.glob("lz4_flex_tpu/native/lz4_native_*.so"),
            key=lambda p: -__import__("os").path.getmtime(p),
        )
        new_path = cands[0]
    data = bench.build_mixed_corpus() if corpus == "mixed" else bench.build_corpus()
    from lz4_flex_tpu import block

    comp = np.frombuffer(block.compress(data), np.uint8)
    total_out = len(data)

    TR, WR, RB, NFMAX = 256, 512, 256, 32
    ntiles = -(-(-(-total_out // 128)) // TR)
    f0 = np.empty((ntiles, NFMAX, RB), np.int32)
    f1 = np.empty_like(f0)
    f2 = np.empty_like(f0)
    nf_tot = np.zeros(ntiles, np.int32)
    fper = np.zeros((ntiles, 1), np.int32)
    lit = np.empty((ntiles * TR, 128), np.uint8)
    depth = np.empty(total_out + 64, np.uint8)
    tot = np.zeros(1, np.int64)
    blk_off = np.zeros(1, np.int64)
    blk_len = np.array([comp.shape[0]], np.int64)
    blk_store = np.zeros(1, np.uint8)

    def call(f, old):
        args = [
            comp.ctypes.data_as(u8p), comp.shape[0],
            blk_off.ctypes.data_as(i64p), blk_len.ctypes.data_as(i64p),
            blk_store.ctypes.data_as(u8p), 1, 0, total_out,
            TR, WR, RB, NFMAX, ntiles, 16, 16, 0,
            f0.ctypes.data_as(i32p), f1.ctypes.data_as(i32p),
            f2.ctypes.data_as(i32p), nf_tot.ctypes.data_as(i32p),
            fper.ctypes.data_as(i32p), lit.ctypes.data_as(u8p),
        ]
        if old:
            args.append(depth.ctypes.data_as(u8p))
        args.append(tot.ctypes.data_as(i64p))
        rc = f(*args)
        assert rc >= 0, rc
        assert int(tot[0]) == total_out

    new = mk(new_path, False)
    call(new, False)
    print(f"new={new_path} fires={int(nf_tot.sum())}")
    old = None
    if old_path != "-":
        old = mk(old_path, True)
        call(old, True)
        print(f"old={old_path} fires={int(nf_tot.sum())}")
    t_new, t_old = [], []
    for _ in range(iters):
        if old is not None:
            t0 = time.perf_counter()
            call(old, True)
            t_old.append((time.perf_counter() - t0) * 1e3)
        t0 = time.perf_counter()
        call(new, False)
        t_new.append((time.perf_counter() - t0) * 1e3)
    t_new.sort()
    if old is not None:
        t_old.sort()
        print(f"old: min {t_old[0]:.2f} med {t_old[len(t_old)//2]:.2f}")
    print(f"new: min {t_new[0]:.2f} med {t_new[len(t_new)//2]:.2f}")


if __name__ == "__main__":
    main()
