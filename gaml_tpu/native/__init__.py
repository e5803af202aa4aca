"""ctypes bindings for the native host kernels, with build-on-demand.

``get_lib()`` returns the loaded library or None (callers fall back to the
Python implementations, which are bit-identical but slower).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "gaml_native.cc")
_SO = os.path.join(_HERE, "libgaml_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile the shared library if missing or stale."""
    if not force and os.path.exists(_SO) and \
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, OSError):
        return False


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("GAML_TPU_NO_NATIVE") == "1":
            return None
        if not build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.maxhash_window_query.restype = ctypes.c_int64
        lib.maxhash_window_query.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.process_hit_batch.restype = None
        lib.process_hit_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p]
        lib.paired_inc_pairs.restype = ctypes.c_int64
        lib.paired_inc_pairs.argtypes = [ctypes.c_void_p, ctypes.c_int32] + \
            [ctypes.c_void_p] * 12 + \
            [ctypes.c_void_p] * 4 + \
            [ctypes.c_void_p, ctypes.c_int64, ctypes.c_double,
             ctypes.c_double, ctypes.c_double, ctypes.c_double,
             ctypes.c_int32] + [ctypes.c_void_p] * 5
        for name in ("reach_limit_compute", "reach_big_compute"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_void_p
            fn.argtypes = [ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
                           ctypes.c_void_p, ctypes.c_int32]
        lib.reach_result_size.restype = ctypes.c_int64
        lib.reach_result_size.argtypes = [ctypes.c_void_p]
        lib.reach_result_copy.restype = None
        lib.reach_result_copy.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.reach_free.restype = None
        lib.reach_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.c_void_p)


def maxhash_window_query(seq: np.ndarray, read_len: int) -> List[Tuple[int, int]]:
    lib = get_lib()
    assert lib is not None
    seq = np.ascontiguousarray(seq, dtype=np.uint8)
    cap = max(16, len(seq))
    out_hash = np.zeros(cap, dtype=np.uint64)
    out_pos = np.zeros(cap, dtype=np.int32)
    n = lib.maxhash_window_query(_ptr(seq), len(seq), read_len,
                                 _ptr(out_hash), _ptr(out_pos), cap)
    return [(int(out_hash[i]), int(out_pos[i])) for i in range(n)]


def process_hit_batch(genome: np.ndarray, cands) -> List[Optional[Tuple[int, int]]]:
    """cands: [(g0, r0, read_codes)].  Returns [(errs, begin) or None]."""
    lib = get_lib()
    assert lib is not None
    n = len(cands)
    if n == 0:
        return []
    genome = np.ascontiguousarray(genome, dtype=np.uint8)
    reads_buf = np.concatenate([np.ascontiguousarray(c[2], dtype=np.uint8)
                                for c in cands])
    offsets = np.zeros(n, dtype=np.int64)
    rlens = np.zeros(n, dtype=np.int32)
    acc = 0
    for i, c in enumerate(cands):
        offsets[i] = acc
        rlens[i] = len(c[2])
        acc += len(c[2])
    g0s = np.array([c[0] for c in cands], dtype=np.int32)
    r0s = np.array([c[1] for c in cands], dtype=np.int32)
    out_errs = np.zeros(n, dtype=np.int32)
    out_begin = np.zeros(n, dtype=np.int32)
    lib.process_hit_batch(_ptr(genome), len(genome), _ptr(reads_buf),
                          _ptr(offsets), _ptr(rlens), _ptr(g0s), _ptr(r0s),
                          n, _ptr(out_errs), _ptr(out_begin))
    return [None if out_errs[i] < 0 else (int(out_errs[i]), int(out_begin[i]))
            for i in range(n)]


def paired_inc_pairs(rids, p1_start, p1_cnt, pos1, ed1, or1,
                     p2_start, p2_cnt, pos2, ed2, or2, rlen1, rlen2,
                     match_pow1, mismatch_pow1, match_pow2, mismatch_pow2,
                     ins_table, ins_mean, ins_std, min_prob_start,
                     min_prob_per_base, use_all_to_cov, total_pairs):
    """Native pair-product loop; returns (p [np], rid [np], ev_pos, ev_typ)."""
    lib = get_lib()
    assert lib is not None
    out_p = np.zeros(max(total_pairs, 1), dtype=np.float64)
    out_rid = np.zeros(max(total_pairs, 1), dtype=np.int32)
    cap_ev = 2 * max(total_pairs, 1)
    out_ev_pos = np.zeros(cap_ev, dtype=np.int32)
    out_ev_typ = np.zeros(cap_ev, dtype=np.int32)
    out_ev_cnt = np.zeros(1, dtype=np.int64)
    n = lib.paired_inc_pairs(
        _ptr(rids), len(rids),
        _ptr(p1_start), _ptr(p1_cnt), _ptr(pos1), _ptr(ed1), _ptr(or1),
        _ptr(p2_start), _ptr(p2_cnt), _ptr(pos2), _ptr(ed2), _ptr(or2),
        _ptr(rlen1), _ptr(rlen2),
        _ptr(match_pow1), _ptr(mismatch_pow1),
        _ptr(match_pow2), _ptr(mismatch_pow2),
        _ptr(ins_table), len(ins_table), ins_mean, ins_std,
        min_prob_start, min_prob_per_base, int(use_all_to_cov),
        _ptr(out_p), _ptr(out_rid), _ptr(out_ev_pos), _ptr(out_ev_typ),
        _ptr(out_ev_cnt))
    ne = int(out_ev_cnt[0])
    return out_p[:n], out_rid[:n], out_ev_pos[:ne], out_ev_typ[:ne]


def _decode_reach(handle, lib):
    size = lib.reach_result_size(handle)
    buf = np.zeros(size, dtype=np.int32)
    if size:
        lib.reach_result_copy(handle, _ptr(buf))
    lib.reach_free(handle)
    out = {}
    i = 0
    while i < size:
        frm, to, ln = int(buf[i]), int(buf[i + 1]), int(buf[i + 2])
        out.setdefault(frm, {})[to] = [int(x) for x in buf[i + 3:i + 3 + ln]]
        i += 3 + ln
    return out


def _csr(graph):
    starts = np.zeros(graph.num_nodes + 1, dtype=np.int32)
    idx = []
    for i in range(graph.num_nodes):
        starts[i + 1] = starts[i] + len(graph.next[i])
        idx.extend(graph.next[i])
    return starts, np.array(idx, dtype=np.int32)


def reach_limit(graph, max_dist: int):
    lib = get_lib()
    assert lib is not None
    starts, idx = _csr(graph)
    lens = np.array([graph.node_len(i) for i in range(graph.num_nodes)],
                    dtype=np.int32)
    handle = lib.reach_limit_compute(graph.num_nodes, _ptr(starts), _ptr(idx),
                                     _ptr(lens), max_dist)
    return _decode_reach(handle, lib)


def reach_big(graph, threshold: int):
    lib = get_lib()
    assert lib is not None
    starts, idx = _csr(graph)
    lens = np.array([graph.node_len(i) for i in range(graph.num_nodes)],
                    dtype=np.int32)
    handle = lib.reach_big_compute(graph.num_nodes, _ptr(starts), _ptr(idx),
                                   _ptr(lens), threshold)
    return _decode_reach(handle, lib)
