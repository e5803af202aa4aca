"""PacBio (long-read) read set.

Replaces the reference's BLASR subprocess pipeline (graph.h:444-593,
graph.cc:2299-3038) with the internal minimizer-chain aligner
(align.longread) and the banded log-space forward kernel (ops.forward):

- anchors: every graph node >= 80 bp is k-mer-indexed in one concatenated
  buffer; each read is scanned once and chained per (node, strand); chains
  whose projected extent covers the node start/end within 10 bp populate
  anchors_begin/anchors_end (reference ComputeAnchors semantics,
  graph.cc:2505-2576);
- walk scoring: reads filtered by anchors on the walk's nodes are chained
  against the spelled walk; each chain's guide band is integrated by the
  forward DP into an alignment log-probability, cached per node-window
  subpath exactly like the reference cache (graph.cc:2724-2785);
- gap estimation between two flanking nodes from one spanning read
  (reference GetGap, graph.cc:2578-2648).

Probabilities use the reference model (match/mismatch/indel =
match_prob/mismatch_prob, free start, full-read consumption); band
construction is internal instead of BLASR CIGARs, so values are
semantically equivalent rather than bit-identical (SURVEY.md section 7,
"Banded DP on TPU").
"""
from __future__ import annotations

import pickle
from typing import Dict, List, NamedTuple, Optional, Sequence, Set, Tuple

import numpy as np

from ..align.longread import SEED_K, align_long_read, chain_hits, guide_path
from ..core import dna
from ..core.io import iter_fastq

K_MIN_ANCHOR_LEN = 80  # reference kMinAnchorLen (graph.cc:31)


class PacbioAlignment(NamedTuple):
    position: int
    position_end: int
    read_id: int
    logprob: float


class PacbioReadSet:
    def __init__(self, name: str, filename: str, match_prob: float,
                 mismatch_prob: float, forward_width: int = 64):
        self.name = name
        self.filename = filename
        self.match_prob = match_prob
        self.mismatch_prob = mismatch_prob
        self.min_match_prob = 1 - 2 * (1 - match_prob)
        self.forward_width = forward_width

        self.reads_num = 0
        self.read_map: Dict[str, int] = {}
        self.read_map_inv: Dict[int, str] = {}
        self.read_seq: List[np.ndarray] = []
        self.read_lens: List[int] = []
        self.max_read_len = 0
        self.load_success = False

        self.aligment_cache: Dict[Tuple[int, ...], List[PacbioAlignment]] = {}
        self.anchors_cache: Dict[int, Set[int]] = {}
        self.anchors_begin: Dict[int, Set[int]] = {}
        self.anchors_end: Dict[int, Set[int]] = {}
        self.anchors_reverse: Dict[int, Set[int]] = {}
        self.positions2: List[List[Tuple[Tuple[int, int], float]]] = []

    # ------------------------------------------------------------- ingestion
    def get_read_id(self, name: str) -> int:
        if name not in self.read_map:
            assert not self.load_success, f"missing read {name}"
            rid = self.reads_num
            self.read_map[name] = rid
            self.read_map_inv[rid] = name
            self.reads_num += 1
            self.read_lens.append(0)
            self.read_seq.append(np.zeros(0, dtype=np.uint8))
        return self.read_map[name]

    def preprocess_reads(self) -> None:
        """Reference graph.cc:1417-1441 (native FASTQ parser when built)."""
        if self.load_success:
            return
        from ..native import read_fastq_arrays

        res = read_fastq_arrays(self.filename)
        if res is None:
            items = ((name, dna.encode_seq(seq))
                     for name, seq in iter_fastq(self.filename))
        else:
            buf, off, names = res
            items = ((names[i], buf[off[i]:off[i + 1]])
                     for i in range(len(names)))
        for name, codes in items:
            rid = self.get_read_id(name)
            self.read_seq[rid] = codes
            self.read_lens[rid] = len(codes)
        self.max_read_len = max(self.read_lens) if self.read_lens else 0
        self.load_success = True

    def get_number_of_reads(self) -> int:
        return self.reads_num

    def get_read_len(self, rid: int) -> int:
        return self.read_lens[rid]

    def get_read_name(self, rid: int) -> str:
        return self.read_map_inv[rid]

    def get_min_read_prob(self, rid: int) -> float:
        """log of mismatch^(0.25 L) * match^(0.75 L)
        (reference GetMinReadProb, graph.h:478-481)."""
        L = self.read_lens[rid]
        return (0.25 * L * np.log(self.mismatch_prob) +
                0.75 * L * np.log(self.match_prob))

    def min_read_probs_array(self) -> np.ndarray:
        """Cached per-read get_min_read_prob values (read lengths are
        fixed after ingestion; hot in the scorer's position filter)."""
        arr = getattr(self, "_min_read_probs", None)
        if arr is None or len(arr) != self.reads_num:
            lens = np.asarray(self.read_lens, dtype=np.float64)
            arr = (0.25 * lens * np.log(self.mismatch_prob) +
                   0.75 * lens * np.log(self.match_prob))
            self._min_read_probs = arr
        return arr

    # ----------------------------------------------------------- persistence
    def save_alignments(self, path: Optional[str] = None) -> None:
        with open(path or self.name, "wb") as f:
            pickle.dump({
                "cache": self.aligment_cache,
                "read_lens": self.read_lens,
                "read_seq": self.read_seq,
                "reads_num": self.reads_num,
                "read_map": self.read_map,
            }, f)

    def load_alignments(self, path: Optional[str] = None) -> bool:
        try:
            with open(path or self.name, "rb") as f:
                data = pickle.load(f)
        except (OSError, pickle.PickleError):
            return False
        self.aligment_cache = data["cache"]
        self.read_lens = data["read_lens"]
        self.read_seq = data["read_seq"]
        self.reads_num = data["reads_num"]
        self.read_map = data["read_map"]
        self.read_map_inv = {v: k for k, v in self.read_map.items()}
        self.max_read_len = max(self.read_lens) if self.read_lens else 0
        self.load_success = True
        return True

    def normalize_cache(self, graph) -> None:
        """Rewrite cache keys through the node-dedup map
        (reference NormalizeCache, graph.cc:1102-1113)."""
        for key in list(self.aligment_cache.keys()):
            npath = tuple(graph.normalize_path(list(key)))
            self.aligment_cache[npath] = self.aligment_cache[key]

    # --------------------------------------------------------------- anchors
    def compute_anchors(self, graph, persist: bool = True) -> None:
        """Reference ComputeAnchors (graph.cc:2505-2576): node -> reads
        aligning to it, plus begin/end-touching subsets and the read ->
        begin-anchored-nodes reverse index."""
        anchors_path = self.name + ".anchors"
        loaded = False
        if persist:
            try:
                with open(anchors_path, "rb") as f:
                    data = pickle.load(f)
                self.anchors_cache = data["cache"]
                self.anchors_begin = data["begin"]
                self.anchors_end = data["end"]
                loaded = True
            except (OSError, pickle.PickleError):
                pass
        if not loaded:
            self._compute_anchors_fresh(graph)
            if persist:
                with open(anchors_path, "wb") as f:
                    pickle.dump({"cache": self.anchors_cache,
                                 "begin": self.anchors_begin,
                                 "end": self.anchors_end}, f)
        self.anchors_reverse = {}
        for node, reads in self.anchors_begin.items():
            for r in reads:
                self.anchors_reverse.setdefault(r, set()).add(node)

    def _compute_anchors_fresh(self, graph) -> None:
        # one concatenated buffer of all anchor-eligible nodes + a single
        # sorted k-mer index; each read queried once per strand, hits
        # grouped by node (fully vectorized, no per-k-mer Python)
        from ..align.longread import SortedKmerIndex

        node_ids = [i for i in range(graph.num_nodes)
                    if graph.node_len(i) >= K_MIN_ANCHOR_LEN]
        if not node_ids or self.reads_num == 0:
            return
        starts = np.zeros(len(node_ids) + 1, dtype=np.int64)
        for i, nid in enumerate(node_ids):
            starts[i + 1] = starts[i] + graph.node_len(nid)
        buffer = np.concatenate([graph.seqs[nid] for nid in node_ids])
        index = SortedKmerIndex(buffer, SEED_K)

        for rid in range(self.reads_num):
            for strand, q in ((0, self.read_seq[rid]),
                              (1, dna.revcomp(self.read_seq[rid]))):
                if len(q) < SEED_K:
                    continue
                tpos, qpos = index.hits(q)
                if len(tpos) == 0:
                    continue
                node_i = np.searchsorted(starts, tpos, "right") - 1
                valid = tpos + SEED_K <= starts[node_i + 1]
                tpos, qpos, node_i = tpos[valid], qpos[valid], node_i[valid]
                off = tpos - starts[node_i]
                order = np.argsort(node_i, kind="stable")
                node_s = node_i[order]
                off_s = off[order]
                qpos_s = qpos[order]
                bounds = np.nonzero(np.concatenate(
                    [[True], node_s[1:] != node_s[:-1]]))[0]
                bounds = np.concatenate([bounds, [len(node_s)]])
                for bi in range(len(bounds) - 1):
                    a, bnd = bounds[bi], bounds[bi + 1]
                    if bnd - a < 3:
                        continue
                    nid = node_ids[int(node_s[a])]
                    hits = list(zip(off_s[a:bnd].tolist(),
                                    qpos_s[a:bnd].tolist()))
                    chains = chain_hits(hits, min_seeds=3)
                    if not chains:
                        continue
                    ch = chains[0]
                    nlen = graph.node_len(nid)
                    rlen = len(q)
                    cov_start = ch.tstart - min(ch.tstart, ch.qstart)
                    cov_end = ch.tend + min(nlen - ch.tend, rlen - ch.qend)
                    self.anchors_cache.setdefault(nid, set()).add(rid)
                    if cov_start <= 10:
                        self.anchors_begin.setdefault(nid, set()).add(rid)
                    if cov_end >= nlen - 10:
                        self.anchors_end.setdefault(nid, set()).add(rid)

    # ----------------------------------------------------- alignment (slow)
    def prewarm_device(self, clear_metrics: bool = True) -> None:
        """Compile the (GAML_PB_CHUNK, rmax-class) forward executable
        ladder by dispatching one full dummy chunk per rung eagerly,
        marking each warm-up-router key ready as its rung lands.
        One-time per process (a co-located deployment amortizes it
        across runs); no-op on CPU platforms or empty read sets.
        Prefer prewarm_device_async — this synchronous form blocks for
        the whole ladder."""
        import os

        if not self.read_seq:
            return
        import jax

        if jax.devices()[0].platform in ("cpu",) and \
                os.environ.get("GAML_PB_FORCE_DEVICE") != "1":
            return
        chunk = int(os.environ.get("GAML_PB_CHUNK", "256"))
        chunk = max(128, ((chunk + 127) // 128) * 128)
        ridx = int(np.argmax([len(r) for r in self.read_seq]))
        r0 = self.read_seq[ridx]
        centers = list(range(len(r0) + 1))
        seq = np.tile(r0, 2)[:len(r0) + 256]
        # resident route: the stage executable is keyed by the walk
        # buffer's coarse bucket too — warm the whole ladder up to
        # GAML_PB_PREWARM_SMAX so anneal batches never pay a cold compile
        warm_seqs = [seq]
        smax = int(os.environ.get("GAML_PB_PREWARM_SMAX", "131072"))
        bkt = 32768 * 4
        while bkt <= smax:
            warm_seqs.append(np.zeros(bkt - 2, dtype=np.uint8))
            bkt *= 4
        from ..utils.warmup import mark_ready, register_inflight

        # resolve the ladder's router keys UP FRONT and claim them for
        # this (possibly background) prewarm: a concurrent production
        # batch hitting a cold key must route native, NOT spawn its own
        # duplicate compile of the same executable (duplicated ladder
        # compiles saturate the serialized relay — measured 15x early-
        # move propose inflation before this claim existed)
        import threading

        from ..ops.forward_device import ForwardDeviceEngine

        mx = max((len(r) for r in self.read_seq), default=128)
        rmax_cls = ((mx + 127) // 128) * 128
        if rmax_cls > getattr(self, "_dev_rmax_class", 0):
            self._dev_rmax_class = rmax_cls
        engine = self._ensure_fwd_engine(rmax_cls) \
            if os.environ.get("GAML_PB_RESIDENT", "1") == "1" else None
        base = ("pb_forward", chunk, rmax_cls)
        if engine is None:
            warm_seqs = warm_seqs[:1]
            keys = [base]
        else:
            keys = [base + (ForwardDeviceEngine.seq_bucket(len(sq)),)
                    for sq in warm_seqs]
        me = threading.current_thread()
        for key in keys:
            register_inflight(key, me)

        done = set()

        def rung_ready(sq, key):
            """Flip this rung's route to the device as soon as its
            executable lands (per-rung, so an async prewarm warms the
            anneal's routes one bucket at a time)."""
            prof = getattr(self, "dp_cells", None)
            if prof and prof.get("pallas"):
                mark_ready(key)
                done.add(key)

        jobs = [(r0, centers, ridx, 0)] * chunk
        try:
            self._forward_batch(seq, jobs, force_device=True)
            rung_ready(seq, keys[0])
            if engine is not None:
                for sq, key in zip(warm_seqs[1:], keys[1:]):
                    self._forward_batch(sq, jobs, force_device=True)
                    rung_ready(sq, key)
        except Exception:
            # un-compiled rungs stay retryable; a dead claim thread must
            # not read as warm (device_ready would otherwise promote it)
            from ..utils.warmup import mark_failed

            for key in keys:
                if key not in done:
                    mark_failed(key)
            raise
        for key in keys:
            if key not in done:  # rung served native (e.g. CPU force)
                from ..utils.warmup import mark_failed

                mark_failed(key, attempts=0)
        if clear_metrics:
            prof = getattr(self, "dp_cells", None)
            if prof is not None:
                prof.clear()

    def prewarm_device_async(self):
        """Run the prewarm ladder in a DAEMON thread: the anneal starts
        immediately with batches served by the exact native kernels, and
        each rung's route flips to the device as its executable lands
        (the short-read warm-up-router pattern, utils/warmup.py) — the
        262 s synchronous ladder at 1 Mb scale (BENCHMARKS.md) comes off
        the critical path entirely.  Metrics are not cleared (prewarm
        DP cells are counted under 'pallas').  Returns the started
        thread, or None when there is nothing to warm."""
        import os

        if not self.read_seq:
            return None
        import jax

        if jax.devices()[0].platform in ("cpu",) and \
                os.environ.get("GAML_PB_FORCE_DEVICE") != "1":
            return None
        import threading

        from ..utils.warmup import _THREADS

        th = threading.Thread(
            target=lambda: self.prewarm_device(clear_metrics=False),
            daemon=True, name="gaml-pb-prewarm")
        _THREADS.append(th)  # joined at interpreter exit like the router's
        th.start()
        return th

    def _ensure_fwd_engine(self, rmax_cls: int):
        """The device forward engine with this read set's RESIDENT packed
        read rows (ops.forward_device); rebuilt only if the rmax class
        grows (a new longest read after ingestion — cannot happen in
        normal use).  Returns None — dense staging — when the resident
        matrices would exceed GAML_PB_RESIDENT_MAX bytes (default 4 GB;
        both strands at 4 bits/base)."""
        import os

        eng = getattr(self, "_fwd_engine", None)
        if eng is not None and eng.rmax_cls == rmax_cls:
            return eng
        n_pad = max(256, 1 << (max(self.reads_num, 1) - 1).bit_length())
        resident_bytes = 2 * n_pad * (rmax_cls // 2)
        cap = int(os.environ.get("GAML_PB_RESIDENT_MAX", 4_000_000_000))
        if resident_bytes > cap:
            import sys

            print(f"[pb.forward] resident read matrices would be "
                  f"{resident_bytes/1e9:.1f} GB > cap {cap/1e9:.1f} GB; "
                  f"using dense staging", file=sys.stderr, flush=True)
            return None
        from ..ops.forward_device import ForwardDeviceEngine

        eng = ForwardDeviceEngine(self.read_seq, rmax_cls)
        self._fwd_engine = eng
        return eng

    def _forward_batch(self, seq: np.ndarray, jobs, extents=None,
                       force_device: bool = False):
        """jobs: list of (read codes, centers).  Returns logprobs list.
        ``extents`` optionally gives each job's (gstart, glen) target span
        inside ``seq`` (for batching jobs over several concatenated
        targets); default = the whole buffer.  Dispatches to the Pallas
        TPU kernel on accelerator backends, the jnp kernel elsewhere.

        ``force_device`` bypasses the cost-model threshold and the
        warm-up router (used by the prewarm ladder; a PARAMETER, not an
        env mutation, so a background prewarm thread cannot flip the
        main thread's routing mid-anneal)."""
        if not jobs:
            return []
        rmax = max(len(j[0]) for j in jobs)
        rmax = ((rmax + 127) // 128) * 128
        b = len(jobs)
        reads = np.full((b, rmax), 6, dtype=np.uint8)
        rlens = np.zeros(b, dtype=np.int32)
        centers = np.zeros((b, rmax + 1), dtype=np.int32)
        # (rid, strand) job metadata for the resident-read device route;
        # rid -1 marks a job without it (falls back to dense staging)
        job_rid = np.full(b, -1, dtype=np.int32)
        job_strand = np.zeros(b, dtype=np.uint8)
        for i, (r, c, *extra) in enumerate(jobs):
            reads[i, :len(r)] = r
            rlens[i] = len(r)
            centers[i, :len(c)] = c
            centers[i, len(c):] = c[-1]
            if extra:
                job_rid[i] = extra[0]
                job_strand[i] = extra[1]
        if extents is None:
            gstarts = np.zeros(b, dtype=np.int32)
            glens = np.full(b, len(seq), dtype=np.int32)
        else:
            gstarts = np.array([e[0] for e in extents], dtype=np.int32)
            glens = np.array([e[1] for e in extents], dtype=np.int32)

        # Small batches don't amortize an accelerator dispatch (with a
        # remote/tunneled chip each call costs tens of ms, and even the
        # lazy jax import pays a client init): run them on the host with
        # the native C++ kernel (same band semantics, double accumulation
        # — agrees with the f32 device kernel to ~1e-5), without touching
        # jax at all.  Threshold in DP cells, GAML_PB_DEVICE_MIN_CELLS.
        width = self.forward_width or 64
        cells = int(rlens.sum()) * width
        prof = getattr(self, "dp_cells", None)
        if prof is None:
            prof = self.dp_cells = {}

        # mesh mode: a ShardedPacbioScorer installed itself as the forward
        # executor — ALL forward-DP cells run under the device mesh
        dispatch = getattr(self, "forward_dispatch", None)
        if dispatch is not None:
            out = dispatch(seq, reads, rlens, centers, gstarts, glens,
                           float(np.log(self.match_prob)),
                           float(np.log(self.mismatch_prob)), rmax, width)
            prof["mesh"] = prof.get("mesh", 0) + cells
            return [float(x) for x in out]

        if __import__("os").environ.get("GAML_PB_DEBUG") == "1":
            print(f"[pb.forward] jobs={len(jobs)} rmax={rmax} "
                  f"seq={len(seq)} cells={cells/1e6:.2f}M", flush=True)
        # The measured device crossover is the library default, not a
        # CLI-only setting: with resident-read staging the crossover
        # moved from ~3M to ~1.5M cells (478.7 vs 424.8 moves/s at the
        # pinned 100 kb scale, BENCHMARKS.md long-read table).
        min_cells = 0 if force_device else int(__import__("os").environ.get(
            "GAML_PB_DEVICE_MIN_CELLS", 1_500_000))
        if cells < min_cells:
            from ..native import get_lib

            if get_lib() is not None:
                from ..native import banded_forward_host

                out = banded_forward_host(
                    seq, reads, rlens, centers, gstarts, glens,
                    float(np.log(self.match_prob)),
                    float(np.log(self.mismatch_prob)), width)
                prof["native"] = prof.get("native", 0) + cells
                return [float(x) for x in out]

        import jax
        import jax.numpy as jnp

        accel = jax.devices()[0].platform not in ("cpu",) or \
            __import__("os").environ.get("GAML_PB_FORCE_DEVICE") == "1"
        if not accel:
            # no accelerator behind jax: the exact f64 native kernel beats
            # the jnp CPU route at any batch size, so above-threshold
            # batches stay native too; the jnp kernel serves only builds
            # without the native library (it stays unit-tested directly)
            from ..native import get_lib

            if get_lib() is not None:
                from ..native import banded_forward_host

                out = banded_forward_host(
                    seq, reads, rlens, centers, gstarts, glens,
                    float(np.log(self.match_prob)),
                    float(np.log(self.mismatch_prob)), width)
                prof["native"] = prof.get("native", 0) + cells
                return [float(x) for x in out]
        use_pallas = accel and self.forward_width in (0, 64, 128)
        if use_pallas:
            from ..ops.forward_pallas import LANES as _PB_LANES
            from ..ops.forward_pallas import banded_forward_pallas

            # ONE executable shape for the whole run: batches are chunked
            # to a fixed (GAML_PB_CHUNK, rmax-class) dispatch shape — the
            # tail chunk rounds up, the read axis pads to the read set's
            # longest read — so every bulk/move batch reuses a single
            # compiled kernel and the chunks pipeline (dispatch all,
            # fetch once).
            chunk = int(__import__("os").environ.get("GAML_PB_CHUNK", "256"))
            chunk = max(_PB_LANES,
                        ((chunk + _PB_LANES - 1) // _PB_LANES) * _PB_LANES)
            rmax_cls = getattr(self, "_dev_rmax_class", 0)
            if rmax > rmax_cls:
                mx = max((len(r) for r in self.read_seq), default=rmax)
                rmax_cls = ((max(mx, rmax) + 127) // 128) * 128
                self._dev_rmax_class = rmax_cls
            lm = float(np.log(self.match_prob))
            lmm = float(np.log(self.mismatch_prob))

            # resident-read route: read rows live on the device (uploaded
            # once per read set), a dispatch ships 2-bit-packed band
            # steps + ~13 B/job of metadata instead of ~12 KB/job of
            # dense staging — the transfer wall was the entire gap
            # between the 48 ms warm dispatch and its ~2 ms of kernel
            # compute.  GAML_PB_RESIDENT=0 restores dense staging.
            engine = None
            if (job_rid >= 0).all() and __import__("os").environ.get(
                    "GAML_PB_RESIDENT", "1") == "1":
                engine = self._ensure_fwd_engine(rmax_cls)

            def chunk_arrays(s, e):
                reads_c = np.full((chunk, rmax_cls), 6, dtype=np.uint8)
                reads_c[:e - s, :rmax] = reads[s:e]
                rlens_c = np.zeros(chunk, dtype=np.int32)
                rlens_c[:e - s] = rlens[s:e]
                centers_c = np.zeros((chunk, rmax_cls + 1), dtype=np.int32)
                centers_c[:e - s, :rmax + 1] = centers[s:e]
                centers_c[:e - s, rmax + 1:] = centers[s:e, -1:]
                gst_c = np.zeros(chunk, dtype=np.int32)
                gst_c[:e - s] = gstarts[s:e]
                gl_c = np.zeros(chunk, dtype=np.int32)
                gl_c[:e - s] = glens[s:e]
                return reads_c, rlens_c, centers_c, gst_c, gl_c

            def chunk_meta(s, e):
                rlens_c = np.zeros(chunk, dtype=np.int32)
                rlens_c[:e - s] = rlens[s:e]
                centers_c = np.zeros((chunk, rmax_cls + 1), dtype=np.int32)
                centers_c[:e - s, :rmax + 1] = centers[s:e]
                centers_c[:e - s, rmax + 1:] = centers[s:e, -1:]
                gst_c = np.zeros(chunk, dtype=np.int32)
                gst_c[:e - s] = gstarts[s:e]
                gl_c = np.zeros(chunk, dtype=np.int32)
                gl_c[:e - s] = glens[s:e]
                rid_c = np.zeros(chunk, dtype=np.int32)
                rid_c[:e - s] = job_rid[s:e]
                str_c = np.zeros(chunk, dtype=np.uint8)
                str_c[:e - s] = job_strand[s:e]
                return rid_c, str_c, rlens_c, centers_c, gst_c, gl_c

            # cost-model routing, as for short reads: the single
            # (chunk, rmax-class) executable compiles server-side for
            # minutes at long-read rmax — a cold shape is served by the
            # native kernel while a background thread warms it with this
            # very batch's first chunk (GAML_DEV_EAGER=1 bypasses)
            from ..native import get_lib as _glib

            if not force_device and \
                    __import__("os").environ.get("GAML_DEV_EAGER") != "1" \
                    and _glib() is not None:
                from ..utils.warmup import device_ready

                def warm():
                    # staging arrays built lazily INSIDE the warm thread:
                    # a default-argument build would copy several MB on
                    # every routed call even once the executable is warm
                    if engine is not None:
                        sp = engine.pack_seq(seq)
                        rid_c, str_c, rlens_c, centers_c, gst_c, gl_c = \
                            chunk_meta(0, min(chunk, b))
                        engine.dispatch(sp, rid_c, str_c, rlens_c,
                                        centers_c, gst_c, gl_c, lm, lmm)
                        return
                    args = chunk_arrays(0, min(chunk, b))
                    banded_forward_pallas(seq, args[0], args[1], args[2],
                                          args[3], args[4], lm, lmm,
                                          rmax_cls)

                # the resident route's stage executable is additionally
                # keyed by the walk buffer's pow2 bucket: a cold bucket
                # serves native while a background thread compiles it
                warm_key = ("pb_forward", chunk, rmax_cls)
                if engine is not None:
                    warm_key += (engine.seq_bucket(len(seq)),)
                if not device_ready(warm_key, warm):
                    from ..native import banded_forward_host

                    out = banded_forward_host(
                        seq, reads, rlens, centers, gstarts, glens,
                        lm, lmm, width)
                    prof["native"] = prof.get("native", 0) + cells
                    return [float(x) for x in out]

            try:
                handles = []
                if engine is None:
                    seq_pairs = None
                elif b > chunk:  # multi-chunk: upload once, reuse
                    seq_pairs = engine.prepare_seq(seq)
                else:            # one chunk: ride the dispatch upload
                    seq_pairs = engine.pack_seq(seq)
                for s in range(0, b, chunk):
                    e = min(s + chunk, b)
                    if engine is not None:
                        rid_c, str_c, rlens_c, centers_c, gst_c, gl_c = \
                            chunk_meta(s, e)
                        h = engine.dispatch(seq_pairs, rid_c, str_c,
                                            rlens_c, centers_c, gst_c,
                                            gl_c, lm, lmm)
                    else:
                        reads_c, rlens_c, centers_c, gst_c, gl_c = \
                            chunk_arrays(s, e)
                        h = banded_forward_pallas(
                            seq, reads_c, rlens_c, centers_c, gst_c, gl_c,
                            lm, lmm, rmax_cls, return_device=True)
                    handles.append((h, e - s))
                fetched = jax.device_get([h for h, _ in handles])
                out = []
                for arr, (_h, k) in zip(fetched, handles):
                    out.extend(float(x) for x in arr[:k])
            except Exception as e:  # device error -> exact native fallback
                from ..native import get_lib

                if get_lib() is None:
                    raise
                import sys

                print(f"[pb.forward] device batch failed "
                      f"({type(e).__name__}); native fallback",
                      file=sys.stderr, flush=True)
                from ..native import banded_forward_host

                out = [float(x) for x in banded_forward_host(
                    seq, reads, rlens, centers, gstarts, glens,
                    lm, lmm, width)]
                prof["native"] = prof.get("native", 0) + cells
                return out
            prof["pallas"] = prof.get("pallas", 0) + cells
            return out

        from ..ops.forward import banded_forward

        out = banded_forward(
            jnp.asarray(seq), jnp.asarray(reads), jnp.asarray(rlens),
            jnp.asarray(centers),
            jnp.asarray(gstarts), jnp.asarray(glens),
            float(np.log(self.match_prob)), float(np.log(self.mismatch_prob)),
            rmax, self.forward_width)
        prof["jnp"] = prof.get("jnp", 0) + cells
        return [float(x) for x in np.asarray(out)]

    def _spell_with_positions(self, graph, path: Sequence[int]):
        """Spell a sub-walk (gaps as N) with per-node end positions
        (reference pathnodesposes bookkeeping, graph.cc:2662-2681)."""
        parts = []
        ends = []
        begins = []
        pos = 0
        for e in path:
            begins.append(pos)
            if e < 0:
                parts.append(np.full(-e, dna.CODE_N, dtype=np.uint8))
                pos += -e
            else:
                parts.append(graph.seqs[e])
                pos += graph.node_len(e)
            ends.append(pos)
        seq = np.concatenate(parts) if parts else np.zeros(0, dtype=np.uint8)
        return seq, begins, ends

    def _slow_prepare(self, graph, path: Sequence[int],
                      save_to_cache: bool = True):
        """First half of GetReadProbabilitiesSlow (graph.cc:2650-2795):
        spell the sub-walk, reserve cache windows, seed+chain the anchored
        reads, and build the forward-DP job list — everything except the
        device call, so several ranges can share one batch."""
        seq, begins, ends = self._spell_with_positions(graph, path)
        path = list(path)

        read_filter: Set[int] = set()
        for e in path:
            if e >= 0:
                read_filter.update(self.anchors_cache.get(e, ()))
        if not read_filter:
            read_filter = set(range(self.reads_num))

        # window bookkeeping for cache assignment (graph.cc:2724-2742)
        subpath_starts: Dict[Tuple[int, ...], int] = {}
        dont_save: Set[Tuple[int, ...]] = set()
        if save_to_cache:
            for i in range(len(path)):
                subpath = []
                for j in range(i, len(path)):
                    subpath.append(path[j])
                    key = tuple(subpath)
                    if key in self.aligment_cache:
                        dont_save.add(key)
                    else:
                        self.aligment_cache[key] = []
                    subpath_starts[key] = i
                    if ends[j] - begins[i] - (ends[i] - begins[i]) > self.max_read_len:
                        break

        jobs = []
        meta = []
        from ..align.longread import SortedKmerIndex, chain_hits

        seq_index = SortedKmerIndex(seq) if len(seq) >= SEED_K else None
        rids = [rid for rid in sorted(read_filter)
                if len(self.read_seq[rid]) >= SEED_K]
        if seq_index is not None and rids:
            # one batched index query for all (read, strand) pairs, with
            # per-read packed k-mers and revcomps cached across rescores;
            # chain emission order matches align_long_read exactly
            kcache = getattr(self, "_seed_kmer_cache", None)
            if kcache is None:
                kcache = self._seed_kmer_cache = {}
            from ..index.maxhash import pack_kmers

            qks = []
            per_read = []
            for rid in rids:
                entry = kcache.get(rid)
                if entry is None:
                    read = self.read_seq[rid]
                    rc = dna.revcomp(read)
                    entry = (read, rc, pack_kmers(read, SEED_K),
                             pack_kmers(rc, SEED_K))
                    kcache[rid] = entry
                per_read.append(entry)
                qks.append(entry[2])
                qks.append(entry[3])
            batch = seq_index.hits_batch_kmers(qks)
            for i, rid in enumerate(rids):
                read, rc, _kf, _kr = per_read[i]
                chains = []
                for strand, q in ((0, read), (1, rc)):
                    tpos, qpos = batch[2 * i + strand]
                    hits = list(zip(tpos.tolist(), qpos.tolist()))
                    for ch in chain_hits(hits, min_seeds=3):
                        chains.append(ch._replace(strand=strand))
                chains.sort(key=lambda c: -c.n_seeds)
                for chain in chains:
                    q = read if chain.strand == 0 else rc
                    centers = guide_path(chain, len(q), len(seq))
                    # (rid, strand) lets the device route read q from its
                    # RESIDENT packed row instead of shipping the bytes
                    jobs.append((q, centers, rid, chain.strand))
                    meta.append((rid, chain))
        return dict(seq=seq, begins=begins, ends=ends, path=path,
                    subpath_starts=subpath_starts, dont_save=dont_save,
                    jobs=jobs, meta=meta, save_to_cache=save_to_cache)

    def _slow_apply(self, prep, logprobs):
        """Second half of GetReadProbabilitiesSlow: record positions and
        append the cached per-subpath alignments."""
        import bisect

        path = prep["path"]
        begins, ends = prep["begins"], prep["ends"]
        total_len = len(prep["seq"])
        positions: List[List[Tuple[int, float]]] = \
            [[] for _ in range(self.reads_num)]
        for (rid, chain), lp in zip(prep["meta"], logprobs):
            tstart = max(0, chain.tstart - chain.qstart)
            tend = min(total_len,
                       chain.tend + (self.read_lens[rid] - chain.qend))
            positions[rid].append((tstart, lp))
            if prep["save_to_cache"]:
                it_begin = bisect.bisect_left(ends, max(0, tstart - 5))
                it_end = bisect.bisect_left(ends, min(tend + 5, total_len))
                it_begin = min(it_begin, len(path) - 1)
                it_end = min(it_end, len(path) - 1)
                key = tuple(path[it_begin:it_end + 1])
                pos_begin = begins[it_begin]
                if prep["subpath_starts"].get(key) == it_begin and \
                        key not in prep["dont_save"]:
                    self.aligment_cache[key].append(PacbioAlignment(
                        tstart - pos_begin, tend - pos_begin, rid, lp))
        return positions, total_len

    def get_read_probabilities_slow(self, graph, path: Sequence[int],
                                    save_to_cache: bool = True):
        """Align anchored reads to the spelled sub-walk and cache per-subpath
        alignments (reference GetReadProbabilitiesSlow, graph.cc:2650-2795).
        Returns (positions, total_len): positions[rid] = [(tstart, logprob)].
        """
        prep = self._slow_prepare(graph, path, save_to_cache)
        logprobs = self._forward_batch(prep["seq"], prep["jobs"])
        return self._slow_apply(prep, logprobs)

    def _prep_ranges(self, graph, path, missing) -> list:
        """Merge overlapping missing (i, j) windows into ranges (reference
        graph.cc:2456-2476) and build their slow-path preps (cache keys
        reserved, jobs chained) without running the forward DP."""
        missing.sort()
        ranges = []
        last_end = -47
        last_begin = -47
        for a, b in missing:
            if a > last_end:
                if last_end != -47:
                    ranges.append((last_begin, last_end))
                last_begin, last_end = a, b
            last_end = max(last_end, b)
        if last_end != -47:
            ranges.append((last_begin, last_end))
        return [self._slow_prepare(graph, path[a:b + 1]) for a, b in ranges]

    def _run_preps(self, preps) -> None:
        """Run every prep's forward-DP jobs in ONE device batch (the kernel
        takes concatenated targets with per-job extents, so the per-call
        (tunnel) latency and dispatch are paid once), then apply."""
        if not preps:
            return
        if len(preps) == 1:
            prep = preps[0]
            self._slow_apply(prep, self._forward_batch(prep["seq"],
                                                       prep["jobs"]))
            return
        bufs, all_jobs, extents, counts = [], [], [], []
        off = 0
        for prep in preps:
            seq = prep["seq"]
            for q, centers, *extra in prep["jobs"]:
                all_jobs.append((q, [c + off for c in centers], *extra))
                extents.append((off, len(seq)))
            counts.append(len(prep["jobs"]))
            bufs.append(seq)
            off += len(seq)
        buf = np.concatenate(bufs) if bufs else np.zeros(0, dtype=np.uint8)
        logprobs = self._forward_batch(buf, all_jobs, extents)
        at = 0
        for prep, k in zip(preps, counts):
            self._slow_apply(prep, logprobs[at:at + k])
            at += k

    def _fill_missing_ranges(self, graph, path, missing) -> None:
        self._run_preps(self._prep_ranges(graph, path, missing))

    def _missing_windows(self, graph, path) -> list:
        """The (i, j) node-window indexes of ``path`` absent from the
        alignment cache (the window enumeration of GetReadProbabilities,
        graph.cc:2438-2454)."""
        begins, ends = [], []
        seq_len = 0
        for e in path:
            begins.append(seq_len)
            seq_len += -e if e < 0 else graph.node_len(e)
            ends.append(seq_len)
        missing = []
        for i in range(len(path)):
            subpath = []
            for j in range(i, len(path)):
                subpath.append(path[j])
                if tuple(subpath) not in self.aligment_cache:
                    missing.append((i, j))
                if ends[j] - begins[i] - (ends[i] - begins[i]) > \
                        self.max_read_len:
                    break
        return missing

    def precompute_ranges_for_paths(self, graph, paths) -> None:
        """Fill every walk's missing cache windows in ONE forward-DP batch
        (the PacBio analogue of the short-read bulk precompute): a full
        rescore over N walks pays one device dispatch instead of N, which
        is what pushes the bulk batch over the device-routing threshold
        (VERDICT r2 item 2).  Cache evolution is identical to the
        sequential per-walk fills: each prep reserves its windows before
        the next prep is built, exactly as interleaved prep/apply would."""
        preps = []
        seen = set()
        for path in paths:
            path = graph.normalize_path(list(path))
            key = tuple(path)
            if key in seen:
                continue
            seen.add(key)
            missing = self._missing_windows(graph, path)
            if missing:
                preps.extend(self._prep_ranges(graph, path, missing))
        self._run_preps(preps)

    # --------------------------------------------------- cached positions
    def get_read_probabilities(self, graph, path: Sequence[int]):
        """Assemble cached per-subpath alignments over a walk, filling
        missing cache ranges via the slow path (reference
        GetReadProbabilities, graph.cc:2410-2503).  Returns
        (positions2, total_len): positions2[rid] = [((start, end), logprob)].
        """
        path = list(path)
        seq_len = 0
        begins, ends = [], []
        for e in path:
            begins.append(seq_len)
            seq_len += -e if e < 0 else graph.node_len(e)
            ends.append(seq_len)
        total_len = seq_len

        subpaths = []
        missing = []
        for i in range(len(path)):
            subpath = []
            for j in range(i, len(path)):
                subpath.append(path[j])
                key = tuple(subpath)
                if key not in self.aligment_cache:
                    missing.append((i, j))
                subpaths.append((key, i))
                if ends[j] - begins[i] - (ends[i] - begins[i]) > self.max_read_len:
                    break
        if missing:
            self._fill_missing_ranges(graph, path, missing)

        self.positions2 = [[] for _ in range(self.reads_num)]
        for key, i in subpaths:
            pos_begin = begins[i]
            for al in self.aligment_cache.get(key, ()):
                self.positions2[al.read_id].append(
                    ((pos_begin + al.position, pos_begin + al.position_end),
                     al.logprob))
        return self.positions2, total_len

    def get_exact_read_probabilities(self, graph, path: Sequence[int],
                                     ps: int):
        """Positions from subpaths starting before index ``ps`` only
        (reference GetExactReadProbabilities, graph.cc:2299-2408; caller
        CalcExactScoreForPacbio is commented out there but the method is
        live surface).  Returns (positions, total_len, total_len2);
        positions carry *subpath-local* start positions, faithfully to the
        reference (no pos_begin offset there)."""
        path = list(path)
        begins, ends = [], []
        seq_len = 0
        back_length = 0
        total_len2 = 0
        for idx, e in enumerate(path):
            begins.append(seq_len)
            ln = graph.node_len(e)
            if idx == 0 or idx < ps:
                total_len2 += ln
            else:
                back_length += ln
            seq_len += ln
            ends.append(seq_len)
        total_len = seq_len
        total_len2 += min(self.max_read_len // 3, back_length)

        missing = []
        for i in range(len(path)):
            subpath = []
            for j in range(i, len(path)):
                subpath.append(path[j])
                if tuple(subpath) not in self.aligment_cache:
                    missing.append((i, j))
                if ends[j] - begins[i] - (ends[i] - begins[i]) > self.max_read_len:
                    break
        if missing:
            self._fill_missing_ranges(graph, path, missing)

        positions: List[List[Tuple[int, float]]] = \
            [[] for _ in range(self.reads_num)]
        for i in range(min(len(path), ps)):
            subpath = []
            for j in range(i, len(path)):
                subpath.append(path[j])
                key = tuple(subpath)
                for al in self.aligment_cache.get(key, ()):
                    positions[al.read_id].append((al.position, al.logprob))
                if ends[j] - begins[i] - (ends[i] - begins[i]) > self.max_read_len:
                    break
        return positions, total_len, total_len2

    # ------------------------------------------------------------------ gaps
    def get_gap(self, graph, first: int, second: int, read_id: int) -> int:
        """Implied gap length between two nodes from one spanning read
        (reference GetGap, graph.cc:2578-2648), with its negative error
        codes: -1 no alignments, -2 strand mismatch, -3 second not at its
        start, -4 first not at its end, -5 read-coordinate overlap."""
        read = self.read_seq[read_id]
        flen = graph.node_len(first)

        def best(node, pick):
            chains = align_long_read(graph.seqs[node], read, min_seeds=3)
            if not chains:
                return None
            return pick(chains)

        fa = best(first, lambda cs: max(cs, key=lambda c: c.tend))
        sa = best(second, lambda cs: min(cs, key=lambda c: c.tstart))
        if fa is None or sa is None:
            return -1
        if fa.strand != sa.strand:
            return -2
        if sa.tstart > 10:
            return -3
        if fa.tend < flen - 10:
            return -4
        if fa.qend > sa.qstart:
            return -5
        return flen - fa.tend + sa.tstart + sa.qstart - fa.qend
