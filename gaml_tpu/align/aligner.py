"""Subpath alignment: candidate generation + extension backend dispatch.

Mirrors the reference's internal aligner (AlignSubpathInternal,
graph.cc:839-899):

1. spell the node-window sequence, trimming long first/last nodes to the
   300 bp that can overlap a junction (offset bookkeeping, graph.cc:846-857);
2. query the max-hash index for candidate (read, signed seed pos) pairs;
3. for each candidate, locate the seed 15-mer in the (possibly
   reverse-complemented) read and run the banded extension;
4. collect alignments, dedup by (position, read_id) keeping the first
   (reference: set<Aligment> insert, graph.cc:895-897), sorted output.

The extension step is pluggable: the "bfs" backend is the exact host oracle
(align.bfs); the "device" backend batches all candidates into the Pallas/JAX
banded-extend kernel (ops.extend) and falls back to the oracle only for
off-band corner cases.
"""
from __future__ import annotations

from typing import Dict, List, NamedTuple, Sequence, Tuple

import numpy as np

from ..core import dna
from ..index.maxhash import K_INDEX_KMER, ReadIndexMaxHash
from . import bfs

K_MIN_SUBPATH_LENGTH = 300  # reference kMinSubpathLength (graph.cc:27)


class Alignment(NamedTuple):
    position: int
    edit_dist: int
    read_id: int
    orientation: int  # 0 = forward, 1 = reverse-complement hit


class AlignmentColumns(NamedTuple):
    """Column-array form of a sorted alignment list — the cache value type
    (native-kernel friendly; python code iterates via .tolist())."""
    position: np.ndarray   # int32
    edit_dist: np.ndarray  # int32
    read_id: np.ndarray    # int32
    orientation: np.ndarray  # int32

    def __len__(self):
        return len(self.position)

    def tuples(self) -> List[Alignment]:
        return [Alignment(p, e, r, o) for p, e, r, o in
                zip(self.position.tolist(), self.edit_dist.tolist(),
                    self.read_id.tolist(), self.orientation.tolist())]

    @staticmethod
    def from_tuples(als: List[Alignment]) -> "AlignmentColumns":
        return AlignmentColumns(
            np.array([a.position for a in als], dtype=np.int32),
            np.array([a.edit_dist for a in als], dtype=np.int32),
            np.array([a.read_id for a in als], dtype=np.int32),
            np.array([a.orientation for a in als], dtype=np.int32))

    def __eq__(self, other):
        return (isinstance(other, AlignmentColumns) and
                all(np.array_equal(a, b) for a, b in zip(self, other)))

    def __ne__(self, other):
        return not self.__eq__(other)


_EMPTY_COLUMNS_ALIGNER = AlignmentColumns(
    np.zeros(0, np.int32), np.zeros(0, np.int32),
    np.zeros(0, np.int32), np.zeros(0, np.int32))


class Candidate(NamedTuple):
    read_id: int
    genome_pos: int  # seed k-mer start in window coordinates
    read_pos: int    # seed k-mer start in (oriented) read coordinates
    orientation: int


def spell_subpath(graph, path: Sequence[int]) -> Tuple[np.ndarray, int]:
    """Window sequence + coordinate offset (graph.cc:846-857)."""
    parts = []
    offset = 0
    n = len(path)
    for i, e in enumerate(path):
        s = graph.seqs[e]
        if i == 0 and n > 1 and len(s) > K_MIN_SUBPATH_LENGTH:
            offset = len(s) - K_MIN_SUBPATH_LENGTH
            parts.append(s[offset:])
        elif i > 0 and len(s) > K_MIN_SUBPATH_LENGTH and i + 1 == n:
            parts.append(s[:K_MIN_SUBPATH_LENGTH])
        else:
            parts.append(s)
    return (np.concatenate(parts) if parts else np.zeros(0, dtype=np.uint8)), offset


def find_seed_in_read(read: np.ndarray, seq: np.ndarray, genome_pos: int,
                      read_kmers: np.ndarray = None,
                      target_kmer: int = None) -> int:
    """First read position whose 15-mer equals the window 15-mer at
    genome_pos (reference scan, graph.cc:873-884), vectorized over packed
    k-mers."""
    from ..index.maxhash import pack_kmers

    k = K_INDEX_KMER
    if target_kmer is None:
        packed = pack_kmers(seq[genome_pos:genome_pos + k], k)
        if len(packed) == 0:
            return -1
        target_kmer = packed[0]
    kmers = read_kmers if read_kmers is not None else pack_kmers(read, k)
    if len(kmers) == 0:
        return -1
    hits = kmers == target_kmer
    idx = int(np.argmax(hits))
    return idx if hits[idx] else -1


class _ReadCache:
    """Oriented read codes + packed k-mers, cached per (read_id, orient).
    With a prebuilt uniform-length k-mer matrix (ReadSet.prepare_read_index)
    forward rows are views, the reverse matrix is one batched bit transform,
    and the seed read-positions are precomputed: with the max-hash index the
    matching k-mer is always the read's fingerprint k-mer, so the seed
    position is a per-(read, orient) constant."""

    def __init__(self, read_seqs: Dict[int, np.ndarray],
                 kmer_matrix: np.ndarray = None,
                 matrix_rids: Dict[int, int] = None):
        self.read_seqs = read_seqs
        self.kmer_matrix = kmer_matrix
        self.matrix_rids = matrix_rids or {}
        self._rc_matrix: np.ndarray = None
        self.seed_kmer_pos: np.ndarray = None  # [n_rows, 2] fwd/rc first-max
        self._cache: Dict[Tuple[int, int], Tuple[np.ndarray, np.ndarray]] = {}

    def build_precomputes(self) -> None:
        """Batch rc k-mer matrix + per-orientation fingerprint k-mer
        positions."""
        from ..index.maxhash import HASH_XOR, revcomp_kmers

        if self.kmer_matrix is None or self.seed_kmer_pos is not None:
            return
        fwd = self.kmer_matrix
        rc = revcomp_kmers(fwd)[:, ::-1]
        self._rc_matrix = np.ascontiguousarray(rc)
        hashes_f = fwd ^ np.uint32(HASH_XOR)
        fp = hashes_f.max(axis=1)
        target = fp ^ np.uint32(HASH_XOR)  # fingerprint k-mer value
        # the rc read matches the genome's *revcomp* of the fingerprint k-mer
        target_rc = revcomp_kmers(target)
        pos_f = np.argmax(fwd == target[:, None], axis=1)
        pos_r = np.argmax(rc == target_rc[:, None], axis=1)
        self.seed_kmer_pos = np.stack([pos_f, pos_r], axis=1).astype(np.int32)

    def seed_pos(self, rid: int, orient: int):
        """Precomputed seed read-position, or None if unavailable."""
        row = self.matrix_rids.get(rid)
        if row is None or self.seed_kmer_pos is None:
            return None
        return int(self.seed_kmer_pos[row, orient])

    def get(self, rid: int, orient: int):
        key = (rid, orient)
        hit = self._cache.get(key)
        if hit is None:
            read = self.read_seqs[rid]
            if orient:
                read = dna.revcomp(read)
            row = self.matrix_rids.get(rid)
            if self.kmer_matrix is not None and row is not None:
                kmers = self.kmer_matrix[row] if not orient else \
                    self._rc_matrix[row]
            else:
                from ..index.maxhash import pack_kmers

                kmers = pack_kmers(read, K_INDEX_KMER)
            hit = (read, kmers)
            self._cache[key] = hit
        return hit


def gen_candidates(index: ReadIndexMaxHash, read_seqs: Dict[int, np.ndarray],
                   seq: np.ndarray,
                   read_cache: "_ReadCache" = None) -> List[Tuple[Candidate, np.ndarray]]:
    """Candidates in deterministic order (read_id asc, hit order).  The
    reference iterates an unordered_map (platform-defined order) — order only
    affects which duplicate wins the (position, read_id) dedup."""
    from ..index.maxhash import ReadIndexMaxHash as _MH, pack_kmers

    cands = index.get_read_cands_with_poses(seq)
    if not cands:
        return []
    cache = read_cache or _ReadCache(read_seqs)
    # with the max-hash index the matching k-mer is always the read's
    # fingerprint k-mer, so the seed read-position is a per-(read, orient)
    # constant (precomputed); other index kinds fall back to the scan
    use_precomputed = isinstance(index, _MH) and cache.kmer_matrix is not None
    if use_precomputed:
        cache.build_precomputes()
    seq_kmers = None
    out: List[Tuple[Candidate, np.ndarray]] = []
    for rid in sorted(cands):
        for e2 in cands[rid]:
            if e2 > 0:
                genome_pos = e2 - K_INDEX_KMER + 1
                read, kmers = cache.get(rid, 0)
                orient = 0
            else:
                genome_pos = len(seq) + e2 - 1
                read, kmers = cache.get(rid, 1)
                orient = 1
            read_pos = cache.seed_pos(rid, orient) if use_precomputed else None
            if read_pos is None:
                if seq_kmers is None:
                    seq_kmers = pack_kmers(seq)  # packed once per window
                read_pos = find_seed_in_read(read, seq, genome_pos, kmers,
                                             seq_kmers[genome_pos])
                assert read_pos != -1, "max-hash candidate without exact seed"
            out.append((Candidate(rid, genome_pos, read_pos, orient), read))
    return out


class SubpathAligner:
    """Alignment engine over node-window subpaths."""

    def __init__(self, index: ReadIndexMaxHash, read_seqs: Dict[int, np.ndarray],
                 backend: str = "bfs"):
        self.index = index
        self.read_seqs = read_seqs
        self.backend = backend
        self._device = None
        self._read_cache = _ReadCache(read_seqs)

    def _extend_all(self, seq: np.ndarray,
                    cands: List[Tuple[Candidate, np.ndarray]]):
        """Run the banded extension for every candidate; returns a list of
        (ok, errs, begin_pos) aligned with cands."""
        if self.backend == "device" and cands:
            from ..ops.extend import batch_extend_host
            return batch_extend_host(seq, cands)
        from ..native import get_lib

        if get_lib() is not None and cands:
            from ..native import process_hit_batch

            triples = [(c.genome_pos, c.read_pos, read) for c, read in cands]
            results = process_hit_batch(seq, triples)
            return [(False, -1, -1) if r is None else (True, r[0], r[1])
                    for r in results]
        out = []
        for cand, read in cands:
            res = bfs.process_hit(cand.genome_pos, cand.read_pos, read, seq)
            if res is None:
                out.append((False, -1, -1))
            else:
                errs, begin, _end = res
                out.append((True, errs, begin))
        return out

    def align_subpath(self, graph, path: Sequence[int]) -> List[Alignment]:
        seq, offset = spell_subpath(graph, path)
        return self.align_seq(seq, offset)

    def align_subpaths_batch(self, graph, paths: List[Sequence[int]],
                             defer: bool = False):
        """Device backend: align many subpaths in ONE batched kernel call
        (amortizes device dispatch across windows).  Returns a list of
        Alignment lists parallel to ``paths`` — or, with ``defer``, a
        zero-arg closure producing it after the (already-dispatched)
        device work completes, so callers can pipeline several read sets'
        batches before blocking on any result.

        With the native bundle attached the host side is fully vectorized:
        candidate generation runs in C++ (query_windows_batch,
        OpenMP-parallel across windows), staging and the first-wins
        (position, read) dedup are numpy array ops — no per-candidate
        Python loop anywhere."""
        bundle = getattr(self, "native_bundle", None)
        if bundle is not None:
            return self._align_subpaths_batch_native(graph, paths, bundle,
                                                     defer=defer)
        from ..ops.extend import batch_extend_multi

        seqs = []
        metas = []  # (subpath_index, offset, cands)
        all_reads: List[np.ndarray] = []
        seq_idx: List[int] = []
        g0s: List[int] = []
        r0s: List[int] = []
        spans: List[Tuple[int, int]] = []
        for si, path in enumerate(paths):
            seq, offset = spell_subpath(graph, path)
            if len(seq) < self.index.read_len or self.index.read_len == 0:
                metas.append((si, offset, []))
                spans.append((len(all_reads), len(all_reads)))
                continue
            cands = gen_candidates(self.index, self.read_seqs, seq,
                                   self._read_cache)
            start = len(all_reads)
            seqs.append(seq)
            for cand, read in cands:
                seq_idx.append(len(seqs) - 1)
                g0s.append(cand.genome_pos)
                r0s.append(cand.read_pos)
                all_reads.append(read)
            metas.append((si, offset, cands))
            spans.append((start, len(all_reads)))

        ok, errs, begin = batch_extend_multi(
            seqs, np.array(seq_idx, dtype=np.int32),
            np.array(g0s, dtype=np.int32), np.array(r0s, dtype=np.int32),
            all_reads, use_pallas=None if self.backend == "device" else False)

        out: List[AlignmentColumns] = [None] * len(paths)
        for (si, offset, cands), (a, b) in zip(metas, spans):
            current: Dict[Tuple[int, int], Alignment] = {}
            for (cand, _read), idx in zip(cands, range(a, b)):
                if not ok[idx]:
                    continue
                al = Alignment(int(begin[idx]) + 1 + offset, int(errs[idx]),
                               cand.read_id, cand.orientation)
                key = (al.position, al.read_id)
                if key not in current:
                    current[key] = al
            out[si] = AlignmentColumns.from_tuples(
                [current[k] for k in sorted(current)])
        return (lambda: out) if defer else out

    def _align_subpaths_batch_native(self, graph, paths, bundle,
                                     defer: bool = False):
        import os as _os
        import time as _time

        from ..native import query_windows_batch
        from ..ops.extend import extend_staged, stage_candidates_uniform

        _dbg = _os.environ.get("GAML_DEV_DEBUG") == "1"
        _t0 = _time.perf_counter()
        rl = self.index.read_len
        out: List[AlignmentColumns] = [None] * len(paths)
        seqs: List[np.ndarray] = []
        offsets: List[int] = []
        keep: List[int] = []
        for si, path in enumerate(paths):
            seq, offset = spell_subpath(graph, path)
            if len(seq) < rl or rl == 0:
                out[si] = _EMPTY_COLUMNS_ALIGNER
                continue
            keep.append(si)
            seqs.append(np.ascontiguousarray(seq, dtype=np.uint8))
            offsets.append(offset)
        if not keep:
            return (lambda: out) if defer else out

        if self.backend == "device" and len(seqs) <= 1024 and \
                _os.environ.get("GAML_DEV_CANDGEN", "1") == "1":
            # round-5 path: candidate generation ON DEVICE against the
            # resident fingerprint index — the batch ships only the
            # 2-bit-packed window buffer (~G/4 bytes) up and 8 B per
            # candidate down (the round-4 path shipped ~18 B/candidate
            # up and 4 B down, and burned host CPU on the query)
            resc = self.ensure_device_rescorer()
            if resc is not None and resc.n_reads < (1 << 20):
                return self._align_batch_device_candgen(
                    resc, seqs, offsets, keep, out, defer, _dbg, _t0)

        qs = query_windows_batch(bundle, seqs)
        if _dbg:
            _t1 = _time.perf_counter()
            print(f"[batch] windows={len(seqs)} query={_t1 - _t0:.2f}s",
                  flush=True)
            _t0 = _t1
        counts = np.array([len(q[0]) for q in qs], dtype=np.int64)
        spans = np.zeros(len(qs) + 1, dtype=np.int64)
        np.cumsum(counts, out=spans[1:])
        if spans[-1] == 0:
            for si in keep:
                out[si] = _EMPTY_COLUMNS_ALIGNER
            return (lambda: out) if defer else out
        rid = np.concatenate([q[0] for q in qs])
        g0 = np.concatenate([q[1] for q in qs])
        r0 = np.concatenate([q[2] for q in qs])
        orient = np.concatenate([q[3] for q in qs])
        seq_idx = np.repeat(np.arange(len(qs), dtype=np.int64), counts)
        seq_lens = np.array([len(s) for s in seqs], dtype=np.int64)
        seq_base = np.zeros(len(seqs), dtype=np.int64)
        np.cumsum(seq_lens[:-1], out=seq_base[1:])
        seq_buf = np.concatenate(seqs)
        rows = bundle.row_of[rid]

        if self.backend == "device":
            # device-resident path: read matrices live on the chip, the
            # call ships only window bytes + 20 B/candidate metadata
            ext = self.ensure_device_extender()
            if _dbg:
                _t1 = _time.perf_counter()
                print(f"[batch] stage={_t1 - _t0:.2f}s", flush=True)
                _t0 = _t1
            fin = ext.run(seq_buf, seq_base, seq_lens, seq_idx,
                          g0, r0, rows, orient, defer=True)
            if _dbg:
                _t1 = _time.perf_counter()
                print(f"[batch] ext.dispatch={_t1 - _t0:.2f}s", flush=True)
                _t0 = _t1
        else:
            st = stage_candidates_uniform(
                seq_buf, seq_base, seq_lens, seq_idx, g0, r0, rows, orient,
                bundle.codes_fwd, bundle.codes_rc, read_ids=rid)
            res = extend_staged(st, use_pallas=False)
            fin = lambda: res  # noqa: E731

        def postprocess():
            ok, errs, begin = fin()
            off_arr = np.asarray(offsets, dtype=np.int64)
            pos_all = begin.astype(np.int64) + 1 + off_arr[seq_idx]
            for w, si in enumerate(keep):
                a, b = int(spans[w]), int(spans[w + 1])
                m = ok[a:b]
                if not m.any():
                    out[si] = _EMPTY_COLUMNS_ALIGNER
                    continue
                pos_w = pos_all[a:b][m].astype(np.int32)
                rid_w = rid[a:b][m]
                ed_w = errs[a:b][m]
                or_w = orient[a:b][m]
                # first-wins (position, rid) dedup in emission order,
                # output sorted by (position, rid) — set<Aligment> semantics
                order = np.lexsort((np.arange(len(pos_w)), rid_w, pos_w))
                ps, rs = pos_w[order], rid_w[order]
                first = np.ones(len(ps), dtype=bool)
                first[1:] = (ps[1:] != ps[:-1]) | (rs[1:] != rs[:-1])
                sel = order[first]
                out[si] = AlignmentColumns(pos_w[sel], ed_w[sel],
                                           rid_w[sel], or_w[sel])
            if _dbg:
                print(f"[batch] fetch+scatter="
                      f"{_time.perf_counter() - _t0:.2f}s", flush=True)
            return out

        return postprocess if defer else postprocess()

    def _align_batch_device_candgen(self, resc, seqs, offsets, keep, out,
                                    defer, _dbg, _t0):
        """Device-candgen batch flow: one packed-window upload, 8 B per
        candidate down, dedup on host (results bit-identical to the
        native-query flow — same candidates in the same emission order,
        tests/test_candgen_device.py)."""
        import time as _time

        from ..ops.candgen_device import _bucket_pow2

        g_total = sum(len(s) for s in seqs)
        s_pad = _bucket_pow2(max(g_total + 1, 1), 4096)
        # cap tied to the buffer bucket: one executable per bucket, and
        # candidate density above cap/G (~0.5/bp at 2x headroom over
        # measured worlds) falls back to the exact native aligner
        cap = max(4096, s_pad // 2)
        fetch = resc.extend(seqs, cap=cap)
        if _dbg:
            _t1 = _time.perf_counter()
            print(f"[batch] candgen.dispatch={_t1 - _t0:.2f}s "
                  f"windows={len(seqs)} s_pad={s_pad} cap={cap}",
                  flush=True)

        def postprocess():
            res, n = fetch()
            if res is None:
                # cap overflow: redo the whole batch with the exact
                # native window aligner (bit-identical output)
                from ..native import align_windows_batch

                for si, r in zip(keep, align_windows_batch(
                        self.native_bundle, seqs, list(offsets))):
                    out[si] = AlignmentColumns(*r)
                return out
            ok, errs, begin, rid, orient, seg = res
            off_arr = np.asarray(offsets, dtype=np.int64)
            pos_all = begin.astype(np.int64) + 1 + off_arr[seg]
            # emission order groups candidates by window (seg ascending)
            spans = np.searchsorted(seg, np.arange(len(seqs) + 1))
            for w, si in enumerate(keep):
                a, b = int(spans[w]), int(spans[w + 1])
                m = ok[a:b]
                if not m.any():
                    out[si] = _EMPTY_COLUMNS_ALIGNER
                    continue
                pos_w = pos_all[a:b][m].astype(np.int32)
                rid_w = rid[a:b][m].astype(np.int32)
                ed_w = errs[a:b][m].astype(np.int32)
                or_w = orient[a:b][m].astype(np.int32)
                order = np.lexsort((np.arange(len(pos_w)), rid_w, pos_w))
                ps, rs = pos_w[order], rid_w[order]
                first = np.ones(len(ps), dtype=bool)
                first[1:] = (ps[1:] != ps[:-1]) | (rs[1:] != rs[:-1])
                sel = order[first]
                out[si] = AlignmentColumns(pos_w[sel], ed_w[sel],
                                           rid_w[sel], or_w[sel])
            if _dbg:
                print(f"[batch] candgen.fetch+scatter="
                      f"{_time.perf_counter() - _t0:.2f}s cands={n}",
                      flush=True)
            return out

        return postprocess if defer else postprocess()

    def ensure_device_rescorer(self):
        """The candgen+extension device engine (resident fingerprint
        index + read matrices); None until the native bundle exists."""
        resc = getattr(self, "_device_rescorer", None)
        if resc is None:
            bundle = getattr(self, "native_bundle", None)
            if bundle is None or bundle.read_len <= K_INDEX_KMER or \
                    bundle.read_len - K_INDEX_KMER > 255 or \
                    len(bundle.row_of) >= (1 << 20):
                return None
            from ..ops.rescore_device import DeviceRescorer

            resc = self._device_rescorer = DeviceRescorer(
                bundle, ext=self.ensure_device_extender())
        return resc

    def ensure_device_extender(self):
        """Create (or return) the device-resident extension engine.
        Construction issues the resident read-matrix uploads as ASYNC
        device_puts, so callers that touch every read set before the
        first (compile-blocking) dispatch overlap all uploads with the
        compile (ProbCalculator.prefetch_alignments does this).
        Returns None if the native bundle isn't attached yet."""
        ext = getattr(self, "_device_extender", None)
        if ext is None:
            bundle = getattr(self, "native_bundle", None)
            if bundle is None:
                return None
            from ..ops.extend_device import DeviceExtender

            ext = self._device_extender = DeviceExtender(
                bundle.codes_fwd, bundle.codes_rc)
        return ext

    def align_seq(self, seq: np.ndarray, offset: int = 0) -> AlignmentColumns:
        """Align all candidate reads against an arbitrary sequence; returns
        the sorted column-array form.  With the C++ bundle attached
        (ReadSet._build_native_bundle) the whole window — query, candidate
        expansion, BFS extension, dedup — runs in one native call."""
        if len(seq) < self.index.read_len or self.index.read_len == 0:
            return AlignmentColumns.from_tuples([])
        bundle = getattr(self, "native_bundle", None)
        if bundle is not None and self.backend == "bfs":
            from ..native import align_window

            pos, ed, rid, orient = align_window(bundle, seq, offset)
            return AlignmentColumns(pos, ed, rid, orient)
        cands = gen_candidates(self.index, self.read_seqs, seq,
                               self._read_cache)
        results = self._extend_all(seq, cands)
        current: Dict[Tuple[int, int], Alignment] = {}
        for (cand, _read), (ok, errs, begin) in zip(cands, results):
            if not ok:
                continue
            al = Alignment(begin + 1 + offset, errs, cand.read_id, cand.orientation)
            key = (al.position, al.read_id)
            if key not in current:  # set<Aligment>: first insert wins
                current[key] = al
        return AlignmentColumns.from_tuples(
            [current[k] for k in sorted(current)])
