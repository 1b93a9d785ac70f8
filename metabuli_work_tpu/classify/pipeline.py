"""End-to-end classification pipeline (host orchestration + device kernels).

Mirrors Classifier::startClassify (reference src/commons/Classifier.cpp:
44-164) with the stage boundaries moved to host<->device transfers:

  host: FASTQ/FASTA decode -> padded uint8 batches
  device: 6-frame metamer extraction (ops/encode_jax.py)
  device: sorted-index probe + hamming filter (ops/match_jax.py)
  host: match compaction + total-order sort (classify/taxonomer.py)
  host: per-read scoring/assignment + reporting

The reference's match-buffer-overflow retry (matchPerKmer += 4 and re-run,
Classifier.cpp:127-131) becomes candidate-cap doubling per batch: the
match kernel reports how many candidates were dropped, and the batch is
re-probed with a larger static cap until exact.
"""

import math
import time
from dataclasses import dataclass, field
from typing import Iterator, List, Optional

import numpy as np

from ..index.format import KmerIndex, load_index
from ..io.fasta import read_seq_file
from ..ops import encode_jax, match_jax
from ..ops import mask as mask_ops
from ..utils.timing import StageTimer
from .taxonomer import MATCH_DTYPE, ReadResult
from .taxonomer_vec import VectorTaxonomer


@dataclass
class ClassifyParams:
    seq_mode: int = 2              # 1 single, 2 paired, 3 long
    min_score: float = 0.0
    min_sp_score: float = 0.0
    min_cons_cnt: int = 4
    min_cons_cnt_euk: int = 9
    tie_ratio: float = 0.95
    mask_mode: int = 0
    mask_prob: float = 0.9
    accession_level: int = 0
    em: bool = False
    batch_size: int = 512
    max_cap: int = 4096
    long_read_chunk: int = 3072    # long reads processed whole up to bucket cap
    # device-memory budget (GiB) for the resident index; when the packed
    # index exceeds half of it, classify switches to DB-range streaming
    # passes (the reference classifies any DB that fits on DISK under
    # --max-ram, README.md:8 — this is the HBM analogue).  0 = resident.
    hbm_budget_gb: float = 0.0


class QueryRecord:
    """__slots__ on purpose — one per read per batch (see ReadResult)."""

    __slots__ = ("name", "length1", "length2", "result")

    def __init__(self, name, length1, length2=0, result=None):
        self.name = name
        self.length1 = length1
        self.length2 = length2
        self.result = result

    @property
    def total_length(self):
        return self.length1 + self.length2

    @property
    def covered_length(self):
        """The length the reference REPORTS and scores against:
        getMaxCoveredLength per mate (Reporter.cpp:56, queryLength)."""
        out = int(_max_covered(np.array([self.length1]))[0])
        if self.length2:
            out += int(_max_covered(np.array([self.length2]))[0])
        return out


def _mesh_size(mesh) -> int:
    return int(np.prod([v for v in mesh.shape.values()])) if mesh else 0


def _max_covered(lens):
    """Reference LocalUtil::getMaxCoveredLength (LocalUtil.h:45-59): the
    read length rounded down to a multiple of 3 minus 3 — the reference
    uses THIS as the query length everywhere (score denominator,
    lower-rank min-match threshold, mate-2 position offset, reported
    query_length), confirmed by the golden diff vs the reference binary.
    """
    lens = np.asarray(lens)
    return np.maximum(lens - np.choose(lens % 3, [3, 4, 2]), 0)


def _fetch_rows(arr):
    """Host copy of a leading-'dp'-sharded device array.

    Single process (fully addressable): all rows.  Multi-host: only the
    rows whose devices belong to this process — each process scores and
    reports its own read shard (SURVEY.md section 5.8).  Returns
    (np.ndarray [n_local, ...], global row ids).
    """
    fully = getattr(arr, "is_fully_addressable", True)
    if fully:
        a = np.asarray(arr)
        return a, list(range(a.shape[0]))
    seen = {}
    for sh in arr.addressable_shards:
        d = np.asarray(sh.data)
        start = sh.index[0].start or 0
        for k in range(d.shape[0]):
            seen.setdefault(start + k, d[k])   # db replicas are identical
    ids = sorted(seen)
    return np.stack([seen[i] for i in ids]), ids


def _bucket_len(n: int, quantum: int = 24) -> int:
    """Pad read length to a bucket: every [N] probe/DP tensor scales with
    lmax//3-7 windows, so a tight quantum directly cuts gather traffic
    (24 nt = 8 codons keeps the distinct-shape count small enough that
    recompiles stay rare)."""
    return max(quantum, quantum * math.ceil(n / quantum))


def _pow2_bucket(n: int, floor: int = 4096) -> int:
    """Round up to a power of two: prefix-slice shapes must come from a
    tiny closed set — each distinct shape compiles its own executable,
    and a per-batch-changing estimate would recompile every batch."""
    return max(floor, 1 << max(0, (int(n) - 1)).bit_length())


def _step_bucket(n: int, step: int, floor: int) -> int:
    """Round up to a multiple of ``step``: finer-grained than pow2 so
    prefix transfers carry less slack (the tunnel moves ~43 MB/s — every
    spare KB is real time), while the shape set stays small enough that
    slice-executable compiles stay rare."""
    return max(floor, step * ((int(n) + step - 1) // step))


def _est_update(cur: int, n: int, step: int, floor: int) -> int:
    """Estimate update with hysteresis: grow immediately (an undersized
    prefix forces a full-width fallback fetch), but shrink only when the
    need sits >= 2 steps below the current estimate — per-batch
    oscillation across a step boundary would recompile the prefix slice
    every batch (~tens of ms each through the tunnel)."""
    want = _step_bucket(n, step, floor)
    if want > cur or want <= cur - 2 * step:
        return want
    return cur


class Classifier:
    def __init__(self, db_dir, params: ClassifyParams, mesh=None):
        self.db_dir = db_dir   # EM caches sp2uniqKmerCnt here (em.py)
        self._init_from_index(load_index(db_dir), params, mesh=mesh)

    @classmethod
    def from_memory(cls, index: KmerIndex, params: ClassifyParams, mesh=None,
                    device_donor=None):
        """Wire a Classifier around an in-memory index (no disk round-trip).

        device_donor: an existing resident Classifier over the SAME
        index — its device-resident arrays (quad rows, hash table,
        taxonomy tables) are shared instead of re-uploaded, so a second
        Classifier with different ClassifyParams (e.g. another seq-mode)
        costs no HBM and no H2D transfer."""
        self = cls.__new__(cls)
        self.db_dir = None
        self._init_from_index(index, params, mesh=mesh,
                              device_donor=device_donor)
        return self

    def _init_from_index(self, index: KmerIndex, params: ClassifyParams,
                         mesh=None, device_donor=None):
        import jax.numpy as jnp

        self.params = params
        self.index = index
        self._device_donor = device_donor
        self.taxonomy = self.index.taxonomy
        meta = self.index.meta
        self.kmer_format = int(meta.get("kmer_format", 2))
        self.syncmer = bool(meta.get("syncmer", False))
        self.smer_len = int(meta.get("smer_len", 5))
        # multi-chip production mode: a (dp, db) jax.sharding.Mesh — the
        # index lives range-sharded over 'db', read batches over 'dp'
        # (reference analog: per-thread DB-range streams,
        # src/commons/KmerMatcher.cpp:166-198).  Single chip when None.
        self.mesh = mesh if (mesh is not None and _mesh_size(mesh) > 1) \
            else None
        # DB-range streaming: when the packed index would blow the HBM
        # budget, keep it host-side and probe it in range passes
        import os as _os

        budget_gb = float(params.hbm_budget_gb or 0) \
            or float(_os.environ.get("METABULI_HBM_GB", "0") or 0)
        self._hbm_budget_gb = budget_gb
        quad_bytes = int(self.index.values.nbytes) * 2   # 16 B/entry packed
        if (budget_gb > 0 and self.mesh is None
                and _os.environ.get("METABULI_WIDE_PROBE", "1") != "1"):
            # the narrow opt-in layout block-ALIGNs run starts
            # (align_runs4, up to ~2.5x padding for short-run DBs) —
            # size the streaming decision on that footprint so a DB
            # just under budget cannot OOM after padding (the default
            # wide layout is unaligned since r5: exactly 16 B/kmer)
            runs = self.index._aa_runs()
            padded = int((((runs + 3) // 4) * 4).sum()) * 16
            align_cap = float(_os.environ.get("METABULI_QUAD_ALIGN_GB",
                                              "6")) * (1 << 30)
            if padded <= align_cap:
                quad_bytes = max(quad_bytes, padded)
        self._streaming = (self.mesh is None and budget_gb > 0
                           and quad_bytes > budget_gb * (1 << 30) * 0.5)
        if self.mesh is None and not self._streaming:
            self.db_values = jnp.asarray(self.index.values)
            self.db_taxids = jnp.asarray(self.index.taxids.astype(np.int32))
            self.db_species = jnp.asarray(self.index.species.astype(np.int32))
            from ..ops import match_jax as _mj

            b_lo, aa_lo, self.bucket_shift, self.bucket_steps = \
                _mj.build_buckets(self.index.values)
            self.bucket_lo = jnp.asarray(b_lo)
            self.db_aa_lo = jnp.asarray(aa_lo)
        # caps round UP to multiples of 4: the candidate window then
        # fills whole 64-byte blocks (aligned gathers fetch exactly
        # cap/4 rows), and odd caps dodge a measured XLA pathology —
        # the cap=15 executable ran ~5x slower than cap=14/16 on v5e
        # (2026-08-21 A/B at the 105M-kmer bench DB)
        self._cap_ceiling = -(-self.index.max_aa_run() // 4) * 4
        self.cap = int(min(max(-(-self.index.cap_aa_run() // 4) * 4, 4),
                           params.max_cap))
        self.taxonomer = VectorTaxonomer(
            self.taxonomy,
            kmer_format=self.kmer_format,
            syncmer=self.syncmer,
            smer_len=self.smer_len,
            seq_mode=params.seq_mode,
            min_score=params.min_score,
            min_sp_score=params.min_sp_score,
            min_cons_cnt=params.min_cons_cnt,
            min_cons_cnt_euk=params.min_cons_cnt_euk,
            tie_ratio=params.tie_ratio,
            # DB-sticky handshake: an accession-level DB re-applies its
            # Accession_level at classify unless the user overrides
            # (reference common.cpp:88-133)
            accession_level=(params.accession_level
                             or int(meta.get("accession_level", 0))),
            em=params.em,
        )
        self.total_match_cnt = 0
        self.timer = StageTimer()
        self._fetch_estimate = 1 << 17  # rows; adapts to observed match counts
        self._path_estimate = 1 << 14   # emitted-path rows
        # redundancy-prefix width compacted inside the kernel (sticky
        # pow2; phase 2 re-runs wider on overflow) — bounds the blocking
        # per-batch pair fetch to ~64 KB
        self._pair_width = 1 << 13
        # static path-compaction width: compact_columns pays out_width
        # gathers per column (5 x width random gathers), so track the
        # observed path counts: grow on overflow (sticky), shrink one
        # power of two after _WIDTH_SHRINK_AFTER consecutive batches
        # needing < 1/3 of the width (each distinct width is one compile)
        self._path_width = 1 << 16
        self._width_lo_streak = 0
        # per-lane slot count for the blocked path packer (dp_jax.
        # pack_paths_blocked); lanes with more emitted paths trigger a
        # sticky doubled re-run
        self._path_block = 16
        # syncmer window-compaction width, in 256ths of W (~62% of windows
        # pass the anchor rule on random sequence; 184/256 = 72% headroom)
        self._win_frac = 184 if self.syncmer else 256
        # host-built right-aligned reads only pay off when the device is
        # directly attached (see _prep_arrays); tunneled backends (axon)
        # prefer the on-device gather
        import jax

        self._host_ra = jax.default_backend() not in ("axon",)
        self._init_device_dp()

    def _init_device_dp(self):
        """Device path-DP flow: valid when minConsCnt >= 2 (see ops/dp_jax)."""
        import jax.numpy as jnp

        p = self.params
        self.use_device_dp = p.min_cons_cnt >= 2 and p.min_cons_cnt_euk >= 2
        if not self.use_device_dp:
            if self.mesh is not None:
                raise ValueError(
                    "multi-device classify requires min_cons_cnt >= 2 "
                    "(the device path-DP flow)")
            if self._streaming:
                raise ValueError(
                    "DB-range streaming requires min_cons_cnt >= 2 "
                    "(the device path-DP flow)")
            return
        # fused Pallas DP kernel (ops/dp_pallas.py) on real TPU backends;
        # the XLA flow stays the default on CPU (the interpret-mode kernel
        # is orders of magnitude slower than compiled XLA there).
        # METABULI_DP_PALLAS=0/1 forces either path (1 on CPU implies
        # interpret mode — integration tests use this).
        import os

        import jax as _jax

        env = os.environ.get("METABULI_DP_PALLAS")
        on_tpu = _jax.default_backend() not in ("cpu",)
        self._dp_pallas = on_tpu if env is None else env == "1"
        self._pallas_interpret = self._dp_pallas and not on_tpu
        # Pallas DP inside shard_map is validated on the CPU mesh in
        # interpret mode (tests/test_mesh_pallas.py); on real TPU
        # meshes it inherits the same on_tpu default as single-chip.
        n = self.taxonomy.num_nodes()
        euk = self.taxonomy.eukaryota_id()
        if euk:
            mask = np.asarray(self.taxonomy.is_ancestor(euk, np.arange(n)))
        else:
            mask = np.zeros(n, dtype=bool)
        # euk-ness rides in bit 30 of the species payload: one candidate
        # gather instead of two ([cap, N] table gathers are ~20 ms each)
        sp = self.index.species.astype(np.int64)
        assert int(sp.max(initial=0)) < (1 << 30)
        sp_euk = (sp | (mask[sp].astype(np.int64) << 30)).astype(np.int32)
        # device LCA tables for the on-device redundancy filter; the
        # euler-first position is prefolded per DB entry so the fused
        # step's payload gather directly yields LCA-ready coordinates
        depth, lift = self.taxonomy.lca_lift_tables()
        self.lca_depth = jnp.asarray(depth)
        self.lca_lift = jnp.asarray(lift)
        ef = self.taxonomy.euler_first.astype(np.int64)
        # the redundancy kernel packs (hamming, euler_first) into one i32
        # key: 6 bits hamming above a 25-bit euler coordinate
        assert len(self.taxonomy.euler) < (1 << 25), \
            "taxonomy too large for packed-key redundancy kernel"
        db_ef = ef[self.index.taxids.astype(np.int64)].astype(np.int32)
        from ..ops.match_jax import build_aa_hash, pack_db_quad

        # wide (512-byte-row) shard layout for the streaming / mesh
        # paths: same ~3x probe win as the single-chip resident path
        # (docs/PERF_NOTES.md); unaligned wide rows since r5, so the
        # shards are exactly 16 B/kmer either way
        if self._streaming or self.mesh is not None:
            self._shard_wide = (os.environ.get("METABULI_WIDE_PROBE", "1")
                                == "1")
            self._shard_bytes = len(self.index.values) * 16
        if self._streaming:
            # index stays HOST-side, cut into AA-boundary ranges sized to
            # the HBM budget; classify loops range passes per batch
            from ..parallel.sharding import shard_quad_index

            quad_np = pack_db_quad(self.index.values, db_ef, sp_euk)
            budget = self._hbm_budget_gb * (1 << 30) * 0.5
            n_ranges = max(2, int(np.ceil(self._shard_bytes / budget)))
            (self._stream_quads, self._stream_hts, self.hash_log2_rows,
             self.hash_chain, _) = shard_quad_index(
                 quad_np, n_ranges, wide=self._shard_wide)
            self._n_ranges = n_ranges
            self.euler = jnp.asarray(self.taxonomy.euler.astype(np.int32))
            self.ef_node = jnp.asarray(ef.astype(np.int32))
            self._device_assign = False   # host-scoring flow when streaming
            self._combine_k = 8
            return
        if self.mesh is not None:
            # metamer-range index shards (AA-boundary cuts) + per-shard
            # hash tables with one uniform geometry; taxonomy tables
            # replicated across the mesh
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.sharding import shard_quad_index

            quad_np = pack_db_quad(self.index.values, db_ef, sp_euk)
            n_db = self.mesh.shape["db"]
            shQ = NamedSharding(self.mesh, P("db", None, None))
            rep = NamedSharding(self.mesh, P())
            # mesh x streaming: when the packed index exceeds the
            # aggregate HBM budget of the 'db' axis, keep it host-side
            # cut into n_ranges x n_db shards — each batch loops range
            # passes whose n_db shards are device_put over 'db' and
            # freed after (VERDICT r2 item 2a; reference analog:
            # RAM-bounded DB streams, QueryIndexer.cpp:30-147)
            budget = self._hbm_budget_gb * (1 << 30) * 0.5
            self._mesh_stream = bool(
                budget > 0 and self._shard_bytes > budget * n_db)
            if self._mesh_stream:
                n_ranges = max(2, int(np.ceil(
                    self._shard_bytes / (budget * n_db))))
                quads, hts, self.hash_log2_rows, self.hash_chain, _ = \
                    shard_quad_index(quad_np, n_ranges * n_db,
                                     wide=self._shard_wide)
                # range r = shard rows [r*n_db, (r+1)*n_db)
                self._stream_quads, self._stream_hts = quads, hts
                self._n_ranges = n_ranges * n_db
                self._mesh_n_ranges = n_ranges
                self._mesh_stream_cache: dict = {}
            else:
                quads, hts, self.hash_log2_rows, self.hash_chain, _ = \
                    shard_quad_index(quad_np, n_db, wide=self._shard_wide)
                # host-side references double as the long-read chunk
                # path's range set (_stream_probe_matches) — mesh mode
                # streams the same AA-boundary cuts for that tail case
                self._stream_quads, self._stream_hts = quads, hts
                self._n_ranges = n_db
                self.db_quad_sh = _jax.device_put(quads, shQ)
                self.hash_sh = _jax.device_put(hts, shQ)
            self.lca_depth = _jax.device_put(np.asarray(self.lca_depth), rep)
            self.lca_lift = _jax.device_put(np.asarray(self.lca_lift), rep)
            self.euler = _jax.device_put(
                self.taxonomy.euler.astype(np.int32), rep)
            self.ef_node = _jax.device_put(ef.astype(np.int32), rep)
            self._device_assign = False   # host-scoring flow over the mesh
            self._combine_k = 8
            self._sharded_cache: dict = {}
            self._sharded_red_cache: dict = {}
            return
        # resident single-chip index: 64-byte block rows (4 entries per
        # row) — wider gather rows run ~2x the bytes/s of entry rows on
        # v5e, so the candidate fetch reads aligned blocks and shuffles
        # the window out on the VPU (match_jax._gather_blocks).  Run
        # starts are padded to block boundaries (align_runs4) so the
        # hash-probe path fetches exactly ceil(cap/4) blocks with no
        # shuffle; ~15-37% more HBM for one fewer 12 MB gather/batch.
        from ..ops.match_jax import align_runs4, pack_db_blocks

        use_hash = os.environ.get("METABULI_HASH_PROBE", "1") == "1"
        # 512-byte-row layout (32 entries/row): XLA's row-gather cost is
        # per-INDEX, not per-byte, and drops ~6x at the full 128-lane
        # row width (profiling/prof_gather_width.py) — the candidate
        # window becomes ~2 gather ops at any cap and the hash probe 1.
        # Requires only the hash (run lengths); run starts may be
        # ARBITRARY since r5 (two-level window select) — no 4-entry
        # alignment padding, so the quad is exactly 16 B/kmer.
        self._wide = (use_hash
                      and os.environ.get("METABULI_WIDE_PROBE", "1")
                      == "1")
        # hash sizing knobs (shared by both layouts): chain=1 wins on
        # v5e up to a ~3 GiB table budget; see the narrow-path comment
        # below for the measured A/B
        mc_env = os.environ.get("METABULI_HASH_CHAIN")
        mc = int(mc_env) if mc_env is not None else 1
        cap_b = int(float(os.environ.get("METABULI_HASH_GB", "3"))
                    * (1 << 30))
        device_donor = getattr(self, "_device_donor", None)
        if (device_donor is not None and getattr(device_donor, "_wide", False)
                and device_donor.index is self.index):
            # share the donor's device-resident index (same content,
            # same geometry) — no second multi-GB upload
            self._wide = True
            self._aligned = False
            starts_pad = None
            for attr in ("db_quad", "hash_table", "hash_log2_rows",
                         "hash_chain", "db_m"):
                setattr(self, attr, getattr(device_donor, attr))
        elif self._wide:
            self._aligned = False
            starts_pad = None
            # pack once per DB, mmap ever after (index/packed_cache.py):
            # the ~2 min of numpy packing at 100M kmers otherwise recurs
            # on every process start
            from ..index.packed_cache import load_or_pack_wide

            rows, ht, self.hash_log2_rows, self.hash_chain, self.db_m = \
                load_or_pack_wide(self.index.values, db_ef, sp_euk,
                                  max_chain=mc,
                                  max_bytes=0 if mc_env else cap_b)
            self.db_quad = jnp.asarray(rows)
            self.hash_table = jnp.asarray(ht)
        elif use_hash:
            # narrow 64-byte block layout (opt-in): alignment costs HBM
            # (runs pad to 4-entry blocks; short-run DBs inflate up to
            # ~2.5x) — only take the one-fewer-gather win while the
            # padded quad stays under a budget
            runs = self.index._aa_runs()
            n_pad = int((((runs + 3) // 4) * 4).sum())
            align_cap = float(os.environ.get("METABULI_QUAD_ALIGN_GB",
                                             "6")) * (1 << 30)
            self._aligned = n_pad * 16 <= align_cap
            if self._aligned:
                v_pad, ef_pad, sp_pad, starts_pad = align_runs4(
                    self.index.values, db_ef, sp_euk)
                self.db_m = len(v_pad)
                self.db_quad = jnp.asarray(pack_db_blocks(
                    pack_db_quad(v_pad, ef_pad, sp_pad)))
            else:
                starts_pad = None
                self.db_m = len(self.index.values)
                self.db_quad = jnp.asarray(pack_db_blocks(
                    pack_db_quad(self.index.values, db_ef, sp_euk)))
        else:
            self._aligned = False
            starts_pad = None
            self.db_m = len(self.index.values)
            self.db_quad = jnp.asarray(pack_db_blocks(
                pack_db_quad(self.index.values, db_ef, sp_euk)))
        # AA-part hash table: `chain` row gathers resolve each query's
        # run start vs 1 + bucket_steps chained gathers for the bucket
        # bisection (the bisection was the single largest device cost,
        # ~15 ms of the 22 ms step).  METABULI_HASH_PROBE=0 restores the
        # bisection.
        if use_hash and not self._wide:
            # Probe cost is gather-byte-bound (~2.6 GB/s effective on
            # v5e through the tunnel; profiling/prof_gather_model.py),
            # and each chain level is one [N]-row 64 B gather per batch
            # (~5 ms at N=190k).  chain=1 (single unchained gather) won
            # the 2026-08-21 A/B: 27.6k vs 27.0k reads/s on a host-bound
            # box, and frees ~5 ms/batch of device time — so it is the
            # DEFAULT up to a ~3 GiB table budget (METABULI_HASH_GB);
            # bigger DBs land on the largest chain that fits.
            # METABULI_HASH_CHAIN overrides (=3 smallest table).
            # (The wide path sized its 42-slot 512-byte-row table inside
            # load_or_pack_wide above with the same knobs.)
            ht, self.hash_log2_rows, self.hash_chain = \
                build_aa_hash(self.index.values, max_chain=mc,
                              max_bytes=0 if mc_env else cap_b,
                              starts_override=starts_pad)
            self.hash_table = jnp.asarray(ht)
        elif not use_hash:
            self.hash_table = None
            self.hash_log2_rows = self.hash_chain = 0
        self.euler = jnp.asarray(self.taxonomy.euler.astype(np.int32))
        # node -> euler-first coordinate, for the on-device tied-set LCA
        # (ops/assign_jax.device_assign)
        self.ef_node = jnp.asarray(ef.astype(np.int32))
        # device-assign flow: score species + pick classifications on
        # device so only [6, B+1] records cross the link (assign_jax).
        # Default OFF: on a single chip the deep pipeline fully hides the
        # host scoring and the D2H path fetch behind device compute
        # (measured: old flow wall 29 ms/batch == its device time), so
        # the assign stage's ~10-15 ms of extra device work is a pure
        # regression (35.1k -> 21.3k reads/s on the tunnel bench).  It
        # pays off when the HOST is the bound — several chips per host,
        # or heavy host-side IO — set METABULI_DEVICE_ASSIGN=1 there.
        # EM needs per-read (species, score) lists -> host flow always.
        env_da = os.environ.get("METABULI_DEVICE_ASSIGN")
        self._device_assign = (env_da == "1") and not p.em
        # adaptive fallback to device-assign when the D2H link degrades
        # (_maybe_switch_device_assign); pinned flows opt out
        self._da_auto_ok = env_da is None and not p.em
        self._combine_k = 8
    # ------------------------------------------------------------------ #
    def _read_batches(self, path1, path2=None) -> Iterator[tuple]:
        """Yield (names, seqs1, seqs2|None) lists of batch_size reads."""
        it1 = read_seq_file(path1)
        it2 = read_seq_file(path2) if path2 else None
        B = self.params.batch_size
        names, s1, s2 = [], [], []
        for rec1 in it1:
            rec2 = next(it2) if it2 else None
            names.append(rec1.name)
            s1.append(rec1.seq)
            s2.append(rec2.seq if rec2 else None)
            if len(names) == B:
                yield names, s1, s2
                names, s1, s2 = [], [], []
        if names:
            yield names, s1, s2

    def _read_batches_native(self, path1, path2=None):
        """Array batches via the native C++ reader (no per-read Python)."""
        from ..io.native_reader import NativeBatchReader

        # long-read mode gets a much larger row cap (reads are processed
        # whole; reference --seq-mode 3 handles arbitrary lengths via the
        # same per-frame scanners)
        cap = 1 << 16 if self.params.seq_mode == 3 else max(self.params.long_read_chunk, 4096)
        r1 = NativeBatchReader(path1, self.params.batch_size, cap)
        r2 = NativeBatchReader(path2, self.params.batch_size, cap) if path2 else None
        for batch1 in r1:
            names, a1, l1 = batch1
            if r2 is not None:
                _, a2, l2 = next(r2)
            else:
                a2 = l2 = None
            yield names, a1, l1, a2, l2

    def _pad_batch(self, seqs: List[str]):
        lmax = _bucket_len(max((len(s) for s in seqs), default=1))
        B = len(seqs)
        arr = np.full((B, lmax), ord("N"), dtype=np.uint8)
        lens = np.zeros(B, dtype=np.int32)
        for i, s in enumerate(seqs):
            if self.params.mask_mode:
                s = mask_ops.mask_low_complexity(s, self.params.mask_prob)
            b = s.encode("ascii", "replace")[:lmax]
            arr[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
            lens[i] = len(b)
        return arr, lens

    # ------------------------------------------------------------------ #
    def _extract_arrays(self, arr, lens, pos_offsets=None):
        import jax.numpy as jnp

        kmers, pos, valid = encode_jax.extract_batch(
            jnp.asarray(arr), jnp.asarray(lens), syncmer=self.syncmer, smer_len=self.smer_len
        )
        if pos_offsets is not None:
            pos = pos + jnp.asarray(pos_offsets, dtype=jnp.int32)[:, None, None]
        return kmers, pos, valid

    def _probe(self, q_kmers, q_frames, q_valid, cap):
        return match_jax.match_kmers(
            q_kmers, q_frames, q_valid,
            self.db_values, self.db_taxids, self.db_species,
            cap=cap, kmer_format=self.kmer_format,
            bucket_lo=self.bucket_lo, db_aa_lo=self.db_aa_lo,
            bucket_shift=self.bucket_shift, bucket_steps=self.bucket_steps,
        )

    def classify_batch(self, names, seqs1, seqs2=None):
        """Classify one batch of string reads (pads then dispatches)."""
        a1, l1 = self._pad_batch(seqs1)
        a2 = l2 = None
        if seqs2 is not None and any(s is not None for s in seqs2):
            a2, l2 = self._pad_batch(seqs2)
        return self.classify_batch_arrays(names, a1, l1, a2, l2)

    def classify_batch_arrays(self, names, a1, l1, a2=None, l2=None):
        """Core batch path: padded uint8 arrays in, QueryRecords out."""
        return self._finish_batch(self._dispatch_batch(names, a1, l1, a2, l2))

    # -- async halves: dispatch launches device work, finish pulls + scores
    def _dispatch_batch(self, names, a1, l1, a2=None, l2=None, cap=None):
        if self.use_device_dp:
            if getattr(self, "_device_assign", False):
                return self._dispatch_batch_full(names, a1, l1, a2, l2, cap)
            return self._dispatch_batch_dp(names, a1, l1, a2, l2, cap)
        return self._dispatch_batch_host(names, a1, l1, a2, l2, cap)

    def _finish_batch(self, ctx):
        if ctx.get("full"):
            return self._finish_full_phase2(self._finish_full_phase1(ctx))
        if ctx.get("dp"):
            return self._finish_batch_dp(ctx)
        return self._finish_batch_host(ctx)

    def _prep_arrays(self, a1, l1, a2, l2, B):
        import jax.numpy as jnp

        from ..ops.encode_jax import right_align

        l1 = np.minimum(np.asarray(l1, dtype=np.int32), a1.shape[1])
        lmax1 = _bucket_len(int(l1.max()) if B else 1)
        h1 = np.ascontiguousarray(a1[:, :lmax1])
        r1 = jnp.asarray(h1)
        # right-aligned copy for the reverse frames.  Host-built
        # (encode_jax.right_align) saves a ~1.6 ms device gather but
        # DOUBLES the read upload; through the tunnel (~43 MB/s H2D)
        # the extra bytes cost more than the gather, so host-build only
        # when the device is directly attached.
        if self._host_ra:
            ra1 = jnp.asarray(right_align(h1, l1))
        else:
            ra1 = None
        j1 = jnp.asarray(l1)
        paired = a2 is not None
        if paired:
            l2 = np.minimum(np.asarray(l2, dtype=np.int32), a2.shape[1])
            lmax2 = _bucket_len(int(l2.max()) if B else 1)
            h2 = np.ascontiguousarray(a2[:, :lmax2])
            r2 = jnp.asarray(h2)
            ra2 = jnp.asarray(right_align(h2, l2)) if self._host_ra else None
            j2 = jnp.asarray(l2)
        else:
            l2 = None
            r2, j2, dra2 = self._dummy_mate2(B)
            ra2 = dra2 if self._host_ra else None
        return r1, j1, r2, j2, l1, l2, paired, ra1, ra2

    def _dummy_mate2(self, B):
        """Cached zero mate-2 arrays (one device allocation per B)."""
        cached = getattr(self, "_dummy2", None)
        if cached is None or cached[0].shape[0] != B:
            import jax.numpy as jnp

            cached = (jnp.zeros((B, 96), dtype=jnp.uint8),
                      jnp.zeros(B, dtype=jnp.int32),
                      jnp.zeros((B, 96), dtype=jnp.uint8))
            self._dummy2 = cached
        return cached

    _WIDTH_SHRINK_AFTER = 4
    _WIDTH_FLOOR = 1 << 13

    def _update_path_width(self, n_paths: int):
        """Shrink the static compaction width once the observed path
        counts prove it oversized (grow-on-overflow lives in the phase-1
        retry loops).  Hysteresis: require _WIDTH_SHRINK_AFTER
        consecutive batches under 1/3 of the width, then halve once —
        width flapping would recompile the fused step each flip."""
        if n_paths * 3 < self._path_width \
                and self._path_width > self._WIDTH_FLOOR:
            self._width_lo_streak += 1
            if self._width_lo_streak >= self._WIDTH_SHRINK_AFTER:
                self._path_width = max(self._path_width >> 1,
                                       self._WIDTH_FLOOR)
                self._width_lo_streak = 0
        else:
            self._width_lo_streak = 0

    def _dispatch_batch_dp(self, names, a1, l1, a2=None, l2=None, cap=None,
                           path_width=None, win_frac=None, path_block=None):
        if self.mesh is not None:
            return self._dispatch_batch_dp_sharded(
                names, a1, l1, a2, l2, cap=cap, path_width=path_width,
                win_frac=win_frac, path_block=path_block)
        if self._streaming:
            return self._dispatch_batch_dp_stream(
                names, a1, l1, a2, l2, cap=cap, path_width=path_width,
                win_frac=win_frac, path_block=path_block)
        from ..models.flagship import fused_step_dp

        B = len(names)
        cap = cap or self.cap
        path_width = path_width or self._path_width
        win_frac = win_frac or self._win_frac
        path_block = path_block or self._path_block
        with self.timer.stage("dispatch"):
            r1, j1, r2, j2, l1, l2, paired, ra1, ra2 = \
                self._prep_arrays(a1, l1, a2, l2, B)
            packed_hdr, resident = fused_step_dp(
                r1, j1, r2, j2, self.db_quad, ra1=ra1, ra2=ra2,
                min_cons=int(self.params.min_cons_cnt),
                min_cons_euk=int(self.params.min_cons_cnt_euk),
                cap=cap, kmer_format=self.kmer_format,
                syncmer=self.syncmer, smer_len=self.smer_len, paired=paired,
                bucket_lo=self.bucket_lo, db_aa_lo=self.db_aa_lo,
                bucket_shift=self.bucket_shift, bucket_steps=self.bucket_steps,
                path_width=path_width, win_frac=win_frac,
                path_block=path_block,
                dp_pallas=getattr(self, "_dp_pallas", False),
                pallas_interpret=getattr(self, "_pallas_interpret", False),
                hash_table=self.hash_table,
                hash_log2_rows=self.hash_log2_rows,
                hash_chain=self.hash_chain,
                db_m=self.db_m,
                aligned=getattr(self, '_aligned', False),
            )
            # column 0 is the stats header; one async copy carries both
            # the stats and the estimated path prefix home
            est = min(self._path_estimate, packed_hdr.shape[1] - 1)
            prefix = packed_hdr[:, :est + 1]
            try:
                prefix.copy_to_host_async()
            except AttributeError:
                pass
            lmax = r1.shape[1] + (r2.shape[1] + 3 if paired else 0)
            n_quot = lmax // int(self.taxonomer.dna_shift) + 2
            from ..models.flagship import part_widths

            part_w = part_widths(r1.shape[1], r2.shape[1], paired,
                                 self.syncmer, self.kmer_format,
                                 self.smer_len, win_frac)
        return {
            "dp": True, "names": names, "l1": l1, "l2": l2, "cap": cap,
            "a1": a1, "a2": a2,
            "paths": packed_hdr, "prefix": prefix, "est": est,
            "resident": resident, "n_quot": n_quot, "part_w": part_w,
        }


    def _dispatch_batch_dp_stream(self, names, a1, l1, a2=None, l2=None,
                                  cap=None, path_width=None, win_frac=None,
                                  path_block=None):
        """Single-batch DB-range streaming dispatch (one full range sweep
        for this batch alone) — the overflow-retry path.  The steady
        state uses _dispatch_group_stream, which amortizes each range
        upload over a whole GROUP of batches."""
        return self._dispatch_group_stream(
            [(names, a1, l1, a2, l2)], cap=cap, path_width=path_width,
            win_frac=win_frac, path_block=path_block)[0]

    def _dispatch_group_stream(self, group, cap=None, path_width=None,
                               win_frac=None, path_block=None):
        """DB-range streaming dispatch over a GROUP of read batches.

        Extract every batch once, then loop range passes: each
        host-resident index range is device_put ONCE per sweep and
        probed against ALL batches before being freed — the dominant
        cost (re-uploading the index) is divided by len(group).  HBM
        holds one range + len(group) accumulator sets.  Returns one ctx
        per batch with the same contract as _dispatch_batch_dp, so the
        two-phase finish and all overflow-retry protocols apply
        unchanged (retries re-run single-batch).

        Reference analog: the --max-ram query-split x DB-stream loop
        (QueryIndexer.cpp:24-147, DeltaIdxReader.h:214-229) with the
        roles flipped — queries stay resident, the index streams; the
        reference likewise sizes reads-per-split so each DB pass serves
        as many queries as RAM allows."""
        import jax.numpy as jnp

        from ..models.flagship import (
            extract_queries_step,
            finish_stream_step,
            part_widths,
            probe_range_step,
        )

        cap = cap or self.cap
        path_width = path_width or self._path_width
        win_frac = win_frac or self._win_frac
        path_block = path_block or self._path_block
        with self.timer.stage("dispatch"):
            per = []
            for names, a1, l1, a2, l2 in group:
                B = len(names)
                r1, j1, r2, j2, l1, l2, paired, ra1, ra2 = \
                    self._prep_arrays(a1, l1, a2, l2, B)
                qk, qp, qf, qs, qv, win_over = extract_queries_step(
                    r1, j1, r2, j2, ra1, ra2, syncmer=self.syncmer,
                    smer_len=self.smer_len, kmer_format=self.kmer_format,
                    win_frac=win_frac, paired=paired)
                N = qk.shape[0]
                acc = (jnp.zeros((cap, N), bool),
                       jnp.zeros((cap, N), jnp.int32),
                       jnp.zeros((cap, N), jnp.int32),
                       jnp.zeros((cap, N), jnp.int32),
                       jnp.zeros((cap, N), jnp.int32),
                       jnp.zeros((cap, N), jnp.int32),
                       jnp.zeros((), jnp.int32))
                per.append(dict(names=names, a1=a1, a2=a2, l1=l1, l2=l2,
                                paired=paired, lm1=r1.shape[1],
                                lm2=r2.shape[1], B=B, qk=qk, qp=qp, qf=qf,
                                qs=qs, qv=qv, win_over=win_over, acc=acc))
            for r in range(self._n_ranges):
                quad_r = jnp.asarray(self._stream_quads[r])
                hash_r = jnp.asarray(self._stream_hts[r])
                for p in per:
                    p["acc"] = probe_range_step(
                        p["qk"], p["qf"], p["qv"], quad_r, hash_r,
                        *p["acc"], cap=cap, kmer_format=self.kmer_format,
                        hash_log2_rows=self.hash_log2_rows,
                        hash_chain=self.hash_chain)
                del quad_r, hash_r   # freed once the sweep's passes retire

            ctxs = []
            for p in per:
                part_w = part_widths(p["lm1"], p["lm2"], p["paired"],
                                     self.syncmer, self.kmer_format,
                                     self.smer_len, win_frac)
                shapes = tuple((p["B"], 6, w // 6) for w in part_w)
                lmax = p["lm1"] + (p["lm2"] + 3 if p["paired"] else 0)
                compact5 = (p["B"] * 6 < (1 << 16)) and (lmax < (1 << 14))
                packed_hdr, resident = finish_stream_step(
                    *p["acc"], p["qp"], p["qs"], p["win_over"],
                    min_cons=int(self.params.min_cons_cnt),
                    min_cons_euk=int(self.params.min_cons_cnt_euk),
                    cap=cap, kmer_format=self.kmer_format,
                    syncmer=self.syncmer, smer_len=self.smer_len,
                    path_width=path_width, win_frac=win_frac,
                    path_block=path_block, compact5=compact5,
                    shapes=shapes,
                    dp_pallas=getattr(self, "_dp_pallas", False),
                    pallas_interpret=getattr(self, "_pallas_interpret",
                                             False))
                est = min(self._path_estimate, packed_hdr.shape[1] - 1)
                prefix = packed_hdr[:, :est + 1]
                try:
                    prefix.copy_to_host_async()
                except AttributeError:
                    pass
                n_quot = lmax // int(self.taxonomer.dna_shift) + 2
                ctxs.append({
                    "dp": True, "names": p["names"], "l1": p["l1"],
                    "l2": p["l2"], "cap": cap, "a1": p["a1"],
                    "a2": p["a2"], "paths": packed_hdr, "prefix": prefix,
                    "est": est, "resident": resident, "n_quot": n_quot,
                    "part_w": part_w,
                })
        return ctxs

    def _stream_group_size(self) -> int:
        """Batches per streaming range sweep: bounded by the HBM left
        after one resident range (each batch holds ~N*cap*24 B of
        accumulators + query tensors).  METABULI_STREAM_GROUP overrides."""
        import os

        env = os.environ.get("METABULI_STREAM_GROUP")
        if env:
            return max(1, int(env))
        budget = self._hbm_budget_gb * (1 << 30)
        # range occupies <= budget/2; leave a safety margin and size the
        # accumulators into the remainder (estimate N from batch_size at
        # 150 bp single-end; long/paired batches are simply a smaller
        # effective group — the estimate only sets the default)
        from ..models.flagship import part_widths

        part_w = part_widths(168, 96, False, self.syncmer,
                             self.kmer_format, self.smer_len,
                             self._win_frac)
        n_est = sum(part_w) * self.params.batch_size
        per_batch = n_est * (self.cap * 24 + 40)
        spare = max(budget * 0.3, 256 << 20)
        return int(min(16, max(1, spare // max(per_batch, 1))))

    def _finish_batch_dp(self, ctx):
        return self._finish_dp_phase2(self._finish_dp_phase1(ctx))

    def _finish_dp_phase1(self, ctx):
        """Fetch emitted paths, score species, enqueue the redundancy
        kernel — but do NOT wait for it (phase 2 does).  Splitting here
        lets the caller run a 2-deep pipeline: the redundancy kernel for
        batch b sits behind batch b+1's fused step in the in-order device
        queue, so its sync must happen one iteration later to avoid
        blocking on a whole device step."""
        if ctx.get("sharded"):
            return self._finish_dp_phase1_sharded(ctx)
        from ..ops import dp_jax
        from .taxonomer import ReadResult as RR

        with self.timer.stage("hdr_sync"):
            _t0 = time.perf_counter()
            hdr = np.asarray(ctx["prefix"])      # ONE blocking fetch
            self._note_sync(time.perf_counter() - _t0)
            st = hdr[:4, 0]
        # Overflow retry ladder: every re-dispatch carries the EFFECTIVE
        # knob values of retries already taken this batch (a cap retry
        # after a win_frac=256 retry must keep win_frac=256), and every
        # condition is rechecked after each retry — a later retry can in
        # principle re-trigger an earlier overflow class.
        eff_wf = None                            # None -> self._win_frac
        eff_cap = ctx["cap"]
        while True:
            def redisp():
                return self._dispatch_batch_dp(
                    ctx["names"], ctx["a1"], ctx["l1"], ctx["a2"],
                    ctx["l2"], cap=eff_cap, win_frac=eff_wf)

            # window-compaction overflow (a row had more syncmer anchors
            # than the compacted width): widen permanently, re-run
            # uncompacted for this batch
            if int(st[2]) > 0:
                self._win_frac = min(self._win_frac + 24, 256)
                eff_wf = 256
            # candidate-cap overflow: doubled sticky cap
            elif int(st[0]) > 0 and eff_cap < self._cap_ceiling:
                eff_cap = min(eff_cap * 2, self._cap_ceiling)
                self.cap = max(self.cap, eff_cap)
            # blocked-packer lane overflow: a (read*frame, cap) lane
            # emitted more than path_block paths — doubled sticky block
            elif int(st[3]) > 0:
                self._path_block *= 2
            # path-compaction width overflow: doubled static width
            elif int(st[1]) > ctx["paths"].shape[1] - 1:
                self._path_width = max(self._path_width,
                                       ctx["paths"].shape[1] - 1) * 2
            else:
                break
            import os as _os

            if _os.environ.get("METABULI_DEBUG_RETRY"):
                import sys as _sys

                print(f"# retry st={st.tolist()} -> cap={eff_cap} "
                      f"wf={eff_wf} pw={self._path_width} "
                      f"pb={self._path_block} wfrac={self._win_frac}",
                      file=_sys.stderr)
            ctx = redisp()
            hdr = np.asarray(ctx["prefix"])
            st = hdr[:4, 0]

        names, l1, l2 = ctx["names"], ctx["l1"], ctx["l2"]
        B = len(names)
        with self.timer.stage("fetch"):
            n = int(st[1])
            if n <= ctx["est"]:
                arr = hdr[:, 1:n + 1]
            else:
                arr = np.asarray(ctx["paths"][:, 1:n + 1])
            # 1.25x headroom: the D2H tunnel runs ~200 MB/s, so prefix
            # bytes are ~5 ms/MB of device-queue time — keep it tight
            self._path_estimate = _est_update(self._path_estimate,
                                              int(n * 1.15), step=4096,
                                              floor=2048)
            self._update_path_width(n)

        with self.timer.stage("score"):
            paths = dp_jax.decode_paths(arr)
            qid = (paths["g"] // 6 + 1).astype(np.int64)
            frame = (paths["g"] % 6).astype(np.int64)
            # reference emission order per (read, species): frame asc, pos asc
            # one packed-key stable argsort beats a 5-key lexsort ~2x;
            # fits a non-negative i64 when qid<=2^19, species<2^25 and
            # end<2^16 (19+25+3+16 = 63 bits)
            if len(qid) and (int(paths["end"].max()) < (1 << 16)
                             and B < (1 << 19)):
                key = (((qid << 25) | paths["species"]) << 19) \
                    | (frame << 16) | paths["end"]
                order = np.argsort(key, kind="stable")
            else:
                order = np.lexsort((np.arange(len(qid)), paths["end"], frame,
                                    paths["species"], qid))
            pa = {
                "qid": qid[order], "species": paths["species"][order],
                "start": paths["start"][order], "end": paths["end"][order],
                "score": paths["score"][order], "hamming": paths["hamming"][order],
                "rh_start": paths["rh_start"][order], "rh_end": paths["rh_end"][order],
            }
            results = [RR() for _ in range(B)]
            lens1 = np.asarray(l1)
            lens2 = np.asarray(l2) if l2 is not None else np.zeros(B, dtype=np.int32)
            qlens = np.zeros(B + 1, dtype=np.int64)
            qlens[1:] = _max_covered(lens1) + np.where(
                lens2 > 0, _max_covered(lens2), 0)
            deferred = self.taxonomer.score_paths(pa, qlens, results)

        out_ctx = {"names": names, "lens1": lens1, "lens2": lens2,
                   "results": results, "deferred": deferred, "qlens": qlens}
        with self.timer.stage("redundancy"):
            if deferred:
                best_sp = np.zeros(B + 1, dtype=np.int32)
                for rid, _, _, taxid in deferred:
                    best_sp[rid] = taxid
                import jax.numpy as jnp

                from ..models.flagship import redundancy_counts

                sel, species, ham, ef, q_pos, q_sids = ctx["resident"]
                bsp = jnp.asarray(best_sp)
                dna_shift = int(self.taxonomer.dna_shift)
                # fixed small prefix compacted INSIDE the kernel (out_w)
                # instead of a full [2, B*n_quot] buffer: the pair fetch
                # is the per-batch D2H tail, and a right-sized prefix is
                # ~10x fewer blocking bytes when the tunnel degrades.
                # Sticky pow2 width; overflow re-runs the (cheap,
                # standalone) kernel wider in phase 2.
                out_w = self._pair_width

                def rerun(w, _a=(sel, species, ham, ef, q_pos, q_sids),
                          _b=bsp, _n=ctx["n_quot"], _p=ctx["part_w"]):
                    return redundancy_counts(
                        *_a, _b, self.euler, self.lca_depth, self.lca_lift,
                        dna_shift=dna_shift, n_quot=_n, part_w=_p, out_w=w)

                packed2 = rerun(out_w)
                try:
                    packed2.copy_to_host_async()
                except AttributeError:
                    pass
                out_ctx.update(prefix2=packed2, est2=out_w,
                               red_rerun=rerun)
        return out_ctx

    def _finish_dp_phase2(self, ctx):
        B = len(ctx["names"])
        results = ctx["results"]
        if ctx["deferred"]:
            with self.timer.stage("redundancy_sync"):
                if ctx.get("sharded"):
                    # [dp, 2, 1+G]: per-shard pair columns; local read
                    # ids shift by the shard's read offset
                    hdr2, rows2 = _fetch_rows(ctx["prefix2"])
                    Bl = ctx["Bl"]
                    rids, taxs = [], []
                    for li, s in enumerate(rows2):
                        n2s = int(hdr2[li, 0, 0])
                        self.total_match_cnt += int(hdr2[li, 1, 0])
                        if n2s:
                            rids.append(hdr2[li, 0, 1:n2s + 1] + s * Bl)
                            taxs.append(hdr2[li, 1, 1:n2s + 1])
                    if rids:
                        m2 = np.stack([np.concatenate(rids),
                                       np.concatenate(taxs)])
                    else:
                        m2 = np.zeros((2, 0), np.int32)
                else:
                    _t0 = time.perf_counter()
                    hdr2 = np.asarray(ctx["prefix2"])  # ONE blocking fetch
                    self._note_sync(time.perf_counter() - _t0)
                    n2 = int(hdr2[0, 0])
                    if n2 <= ctx["est2"]:
                        m2 = hdr2[:, 1:n2 + 1]
                    elif "red_rerun" in ctx:
                        # prefix overflow: re-run the standalone kernel
                        # at the next pow2 >= n2 (sticky for later
                        # batches) and fetch the wider prefix
                        w = ctx["est2"]
                        while w < n2:
                            w *= 2
                        self._pair_width = max(self._pair_width, w)
                        hdr2 = np.asarray(ctx["red_rerun"](w))
                        m2 = hdr2[:, 1:n2 + 1]
                    else:
                        m2 = np.asarray(ctx["pairs"][:, 1:n2 + 1])
                    self.total_match_cnt += int(hdr2[1, 0])
                # per-(read, lca) group counts -> tax_cnt dicts
                tax_cnts: dict = {}
                try:
                    from .native_score import available, count_pairs

                    native = available()
                except Exception:
                    native = False
                if native:
                    u_rid, u_tax, u_cnt = count_pairs(m2[0], m2[1])
                    for r, t, c in zip(u_rid.tolist(), u_tax.tolist(),
                                       u_cnt.tolist()):
                        tax_cnts.setdefault(r, {})[t] = c
                else:
                    key = (m2[0].astype(np.int64) << 32) | m2[1].astype(np.int64)
                    uniq, cnts = np.unique(key, return_counts=True)
                    for k, c in zip(uniq.tolist(), cnts.tolist()):
                        tax_cnts.setdefault(k >> 32, {})[k & 0xFFFFFFFF] = int(c)
                self.taxonomer.finish_with_taxcnt(ctx["deferred"], tax_cnts,
                                                  ctx["qlens"], results)

        out = []
        for i in ctx.get("local_reads", range(B)):
            qr = QueryRecord(ctx["names"][i], int(ctx["lens1"][i]),
                             int(ctx["lens2"][i]))
            qr.result = results[i]
            out.append(qr)
        return out

    # ------------------------------------------------------------------ #
    # multi-chip production flow: the same two-phase host protocol as the
    # single-chip DP flow, but the fused step runs shard_map'd over the
    # (dp, db) mesh — index range-sharded over 'db' (one psum candidate
    # merge), reads over 'dp'; paths/stats come home per dp shard.
    def _sharded_step(self, cap, paired, path_width, win_frac, path_block):
        key = (cap, paired, path_width, win_frac, path_block)
        step = self._sharded_cache.get(key)
        if step is None:
            from ..parallel.sharding import make_sharded_fused_dp_prod

            step = make_sharded_fused_dp_prod(
                self.mesh, cap=cap, kmer_format=self.kmer_format,
                syncmer=self.syncmer, smer_len=self.smer_len, paired=paired,
                min_cons=int(self.params.min_cons_cnt),
                min_cons_euk=int(self.params.min_cons_cnt_euk),
                path_width=path_width, win_frac=win_frac,
                path_block=path_block,
                hash_log2_rows=self.hash_log2_rows,
                hash_chain=self.hash_chain, has_ra=self._host_ra,
                dp_pallas=getattr(self, "_dp_pallas", False),
                pallas_interpret=getattr(self, "_pallas_interpret", False))
            self._sharded_cache[key] = step
        return step

    def _sharded_red(self, n_quot, part_w):
        key = (n_quot, part_w)
        red = self._sharded_red_cache.get(key)
        if red is None:
            from ..parallel.sharding import make_sharded_redundancy

            red = make_sharded_redundancy(
                self.mesh, dna_shift=int(self.taxonomer.dna_shift),
                n_quot=n_quot, part_w=part_w)
            self._sharded_red_cache[key] = red
        return red

    def _prep_arrays_sharded(self, a1, l1, a2, l2, B):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..ops.encode_jax import right_align

        dp = self.mesh.shape["dp"]
        B_pad = -(-max(B, 1) // dp) * dp

        def pad_b(arr):
            if arr.shape[0] == B_pad:
                return np.ascontiguousarray(arr)
            out = np.zeros((B_pad,) + arr.shape[1:], dtype=arr.dtype)
            out[:B] = arr
            return out

        shN = NamedSharding(self.mesh, P("dp", None))
        sh1 = NamedSharding(self.mesh, P("dp"))
        l1 = np.minimum(np.asarray(l1, dtype=np.int32), a1.shape[1])
        lmax1 = _bucket_len(int(l1.max()) if B else 1)
        h1 = pad_b(a1[:, :lmax1])
        l1p = pad_b(l1)
        r1 = jax.device_put(h1, shN)
        j1 = jax.device_put(l1p, sh1)
        ra1 = jax.device_put(right_align(h1, l1p), shN) if self._host_ra \
            else None
        paired = a2 is not None
        if paired:
            l2 = np.minimum(np.asarray(l2, dtype=np.int32), a2.shape[1])
            lmax2 = _bucket_len(int(l2.max()) if B else 1)
            h2 = pad_b(a2[:, :lmax2])
            l2p = pad_b(l2)
            r2 = jax.device_put(h2, shN)
            j2 = jax.device_put(l2p, sh1)
            ra2 = jax.device_put(right_align(h2, l2p), shN) if self._host_ra \
                else None
        else:
            l2 = None
            r2 = jax.device_put(np.zeros((B_pad, 96), np.uint8), shN)
            j2 = jax.device_put(np.zeros(B_pad, np.int32), sh1)
            ra2 = r2 if self._host_ra else None
        return r1, j1, r2, j2, l1, l2, paired, ra1, ra2, B_pad

    def _mesh_stream_steps(self, cap, paired, path_width, win_frac,
                           path_block, compact5, shapes):
        key = (cap, paired, path_width, win_frac, path_block, compact5,
               shapes)
        steps = self._mesh_stream_cache.get(key)
        if steps is None:
            from ..parallel.sharding import make_sharded_stream_steps

            steps = make_sharded_stream_steps(
                self.mesh, cap=cap, kmer_format=self.kmer_format,
                syncmer=self.syncmer, smer_len=self.smer_len,
                paired=paired, min_cons=int(self.params.min_cons_cnt),
                min_cons_euk=int(self.params.min_cons_cnt_euk),
                path_width=path_width, win_frac=win_frac,
                path_block=path_block, compact5=compact5, shapes=shapes,
                hash_log2_rows=self.hash_log2_rows,
                hash_chain=self.hash_chain, has_ra=self._host_ra)
            self._mesh_stream_cache[key] = steps
        return steps

    def _dispatch_batch_dp_stream_sharded(self, names, a1, l1, a2=None,
                                          l2=None, cap=None, path_width=None,
                                          win_frac=None, path_block=None):
        """mesh x DB-streaming dispatch: extract once per batch, loop
        range passes (each range device_put over 'db' for its pass and
        freed after), then the dp-local finish.  Same ctx contract as
        _dispatch_batch_dp_sharded so the sharded two-phase finish and
        all retry protocols apply unchanged."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..models.flagship import part_widths

        B = len(names)
        cap = cap or self.cap
        path_width = path_width or self._path_width
        win_frac = win_frac or self._win_frac
        path_block = path_block or self._path_block
        n_db = self.mesh.shape["db"]
        with self.timer.stage("dispatch"):
            r1, j1, r2, j2, l1, l2, paired, ra1, ra2, B_pad = \
                self._prep_arrays_sharded(a1, l1, a2, l2, B)
            part_w = part_widths(r1.shape[1], r2.shape[1], paired,
                                 self.syncmer, self.kmer_format,
                                 self.smer_len, win_frac)
            Bl = B_pad // self.mesh.shape["dp"]
            shapes = tuple((Bl, 6, w // 6) for w in part_w)
            lmax = r1.shape[1] + (r2.shape[1] + 3 if paired else 0)
            compact5 = (Bl * 6 < (1 << 16)) and (lmax < (1 << 14))
            extract, probe, finish = self._mesh_stream_steps(
                cap, paired, path_width, win_frac, path_block, compact5,
                shapes)
            args = [r1, j1, r2, j2] + ([ra1, ra2] if self._host_ra else [])
            qk, qp, qf, qs, qv, win_over = extract(*args)
            N = qk.shape[0]
            accN = NamedSharding(self.mesh, P(None, "dp"))
            rep = NamedSharding(self.mesh, P())
            shQ = NamedSharding(self.mesh, P("db", None, None))
            acc = [jax.device_put(np.zeros((cap, N), np.int32), accN)
                   for _ in range(6)]
            acc[0] = jax.device_put(np.zeros((cap, N), bool), accN)
            acc.append(jax.device_put(np.zeros((), np.int32), rep))
            for r in range(self._mesh_n_ranges):
                quad_r = jax.device_put(
                    self._stream_quads[r * n_db:(r + 1) * n_db], shQ)
                hash_r = jax.device_put(
                    self._stream_hts[r * n_db:(r + 1) * n_db], shQ)
                acc = list(probe(qk, qf, qv, quad_r, hash_r, *acc))
                del quad_r, hash_r
            packed_hdr, *resident = finish(*acc, qp, qs, win_over)
            est = min(self._path_estimate, packed_hdr.shape[2] - 1)
            prefix = packed_hdr[:, :, :est + 1]
            try:
                prefix.copy_to_host_async()
            except Exception:
                pass
            n_quot = lmax // int(self.taxonomer.dna_shift) + 2
        return {
            "dp": True, "sharded": True, "names": names, "l1": l1, "l2": l2,
            "cap": cap, "a1": a1, "a2": a2, "B_pad": B_pad,
            "paths": packed_hdr, "prefix": prefix, "est": est,
            "resident": tuple(resident), "n_quot": n_quot, "part_w": part_w,
        }

    def _dispatch_batch_dp_sharded(self, names, a1, l1, a2=None, l2=None,
                                   cap=None, path_width=None, win_frac=None,
                                   path_block=None):
        from ..models.flagship import part_widths

        if getattr(self, "_mesh_stream", False):
            return self._dispatch_batch_dp_stream_sharded(
                names, a1, l1, a2, l2, cap=cap, path_width=path_width,
                win_frac=win_frac, path_block=path_block)
        B = len(names)
        cap = cap or self.cap
        path_width = path_width or self._path_width
        win_frac = win_frac or self._win_frac
        path_block = path_block or self._path_block
        with self.timer.stage("dispatch"):
            r1, j1, r2, j2, l1, l2, paired, ra1, ra2, B_pad = \
                self._prep_arrays_sharded(a1, l1, a2, l2, B)
            step = self._sharded_step(cap, paired, path_width, win_frac,
                                      path_block)
            args = [r1, j1, r2, j2, self.db_quad_sh, self.hash_sh]
            if self._host_ra:
                args += [ra1, ra2]
            packed_hdr, *resident = step(*args)
            est = min(self._path_estimate, packed_hdr.shape[2] - 1)
            prefix = packed_hdr[:, :, :est + 1]
            try:
                prefix.copy_to_host_async()
            except Exception:   # multi-process arrays may refuse; harmless
                pass
            lmax = r1.shape[1] + (r2.shape[1] + 3 if paired else 0)
            n_quot = lmax // int(self.taxonomer.dna_shift) + 2
            part_w = part_widths(r1.shape[1], r2.shape[1], paired,
                                 self.syncmer, self.kmer_format,
                                 self.smer_len, win_frac)
        return {
            "dp": True, "sharded": True, "names": names, "l1": l1, "l2": l2,
            "cap": cap, "a1": a1, "a2": a2, "B_pad": B_pad,
            "paths": packed_hdr, "prefix": prefix, "est": est,
            "resident": tuple(resident), "n_quot": n_quot, "part_w": part_w,
        }

    def _finish_dp_phase1_sharded(self, ctx):
        """Sharded twin of _finish_dp_phase1: per-dp-shard stats headers,
        per-shard path decode with global read-id offsets."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..ops import dp_jax
        from .taxonomer import ReadResult as RR

        def redisp(**kw):
            return self._dispatch_batch_dp_sharded(
                ctx["names"], ctx["a1"], ctx["l1"], ctx["a2"], ctx["l2"],
                **kw)

        with self.timer.stage("hdr_sync"):
            hdr, rows = _fetch_rows(ctx["prefix"])   # [n_local, C, est+1]
            st = hdr[:, :5, 0]
        # stats rows 0/2/3/4 are GLOBAL (psum/pmax over 'dp' on device),
        # so every host takes identical retry decisions — a divergent
        # static-arg recompile would deadlock the mesh collectives
        if int(st[:, 2].max()) > 0:              # window compaction
            self._win_frac = min(self._win_frac + 24, 256)
            ctx = redisp(cap=ctx["cap"], win_frac=256)
            hdr, rows = _fetch_rows(ctx["prefix"])
            st = hdr[:, :5, 0]
        while int(st[:, 0].max()) > 0 and ctx["cap"] < self._cap_ceiling:
            cap = min(ctx["cap"] * 2, self._cap_ceiling)
            self.cap = max(self.cap, cap)
            ctx = redisp(cap=cap)
            hdr, rows = _fetch_rows(ctx["prefix"])
            st = hdr[:, :5, 0]
        while int(st[:, 3].max()) > 0:           # blocked-packer lanes
            self._path_block *= 2
            ctx = redisp(cap=ctx["cap"], path_block=self._path_block)
            hdr, rows = _fetch_rows(ctx["prefix"])
            st = hdr[:, :5, 0]
        while int(st[:, 4].max()) > ctx["paths"].shape[2] - 1:
            self._path_width = max(self._path_width,
                                   ctx["paths"].shape[2] - 1) * 2
            ctx = redisp(cap=ctx["cap"], path_width=self._path_width)
            hdr, rows = _fetch_rows(ctx["prefix"])
            st = hdr[:, :5, 0]

        names, l1, l2 = ctx["names"], ctx["l1"], ctx["l2"]
        B = len(names)
        B_pad = ctx["B_pad"]
        n_dp = self.mesh.shape["dp"]
        Bl = B_pad // n_dp
        with self.timer.stage("fetch"):
            n_s = st[:, 1]
            n_max = int(n_s.max()) if len(n_s) else 0
            if n_max <= ctx["est"]:
                full = hdr
            else:
                full, rows = _fetch_rows(ctx["paths"])
            self._path_estimate = _est_update(self._path_estimate,
                                              int(n_max * 1.15), step=4096,
                                              floor=2048)
            self._update_path_width(int(st[:, 4].max()) if len(st) else 0)

        with self.timer.stage("score"):
            parts = []
            for li, s in enumerate(rows):
                n = int(n_s[li])
                if n == 0:
                    continue
                d = dp_jax.decode_paths(full[li][:, 1:n + 1])
                d["qid"] = (d["g"] // 6 + 1 + s * Bl).astype(np.int64)
                d["frame"] = (d["g"] % 6).astype(np.int64)
                parts.append(d)
            if parts:
                keys = [k for k in parts[0] if k != "g"]
                cat = {k: np.concatenate([p[k] for p in parts])
                       for k in keys}
            else:
                cat = {k: np.zeros(0, np.int64) for k in
                       ("qid", "frame", "species", "start", "end",
                        "hamming", "rh_start", "rh_end")}
                cat["score"] = np.zeros(0, np.float32)
            qid, frame = cat["qid"], cat["frame"]
            if len(qid) and (int(cat["end"].max()) < (1 << 16)
                             and B_pad < (1 << 19)):
                key = (((qid << 25) | cat["species"]) << 19) \
                    | (frame << 16) | cat["end"]
                order = np.argsort(key, kind="stable")
            else:
                order = np.lexsort((np.arange(len(qid)), cat["end"], frame,
                                    cat["species"], qid))
            pa = {
                "qid": qid[order], "species": cat["species"][order],
                "start": cat["start"][order], "end": cat["end"][order],
                "score": cat["score"][order],
                "hamming": cat["hamming"][order],
                "rh_start": cat["rh_start"][order],
                "rh_end": cat["rh_end"][order],
            }
            results = [RR() for _ in range(B_pad)]
            lens1 = np.asarray(l1)
            lens2 = np.asarray(l2) if l2 is not None \
                else np.zeros(B, dtype=np.int32)
            qlens = np.zeros(B_pad + 1, dtype=np.int64)
            qlens[1:B + 1] = _max_covered(lens1) + np.where(
                lens2 > 0, _max_covered(lens2), 0)
            deferred = self.taxonomer.score_paths(pa, qlens, results)

        # reads this process owns (all of them in single-process runs)
        local_reads = []
        for s in rows:
            local_reads.extend(range(s * Bl, min((s + 1) * Bl, B)))
        out_ctx = {"names": names, "lens1": lens1, "lens2": lens2,
                   "results": results, "deferred": deferred, "qlens": qlens,
                   "sharded": True, "Bl": Bl, "local_reads": local_reads}
        with self.timer.stage("redundancy"):
            if deferred:
                best_sp = np.zeros((n_dp, Bl + 1), dtype=np.int32)
                for rid, _, _, taxid in deferred:
                    s, r = divmod(rid - 1, Bl)
                    best_sp[s, r + 1] = taxid
                red = self._sharded_red(ctx["n_quot"], ctx["part_w"])
                sh = NamedSharding(self.mesh, P("dp", None))
                if jax.process_count() == 1:
                    bsp = jax.device_put(best_sp, sh)
                else:
                    # each process only scored its own dp rows; hand JAX
                    # the local rows instead of a (divergent) global array
                    bsp = jax.make_array_from_process_local_data(
                        sh, best_sp[rows], best_sp.shape)
                packed2 = red(*ctx["resident"], bsp, self.euler,
                              self.lca_depth, self.lca_lift)
                prefix2 = packed2            # full width (see single-chip)
                try:
                    prefix2.copy_to_host_async()
                except Exception:
                    pass
                out_ctx.update(pairs=packed2, prefix2=prefix2,
                               est2=packed2.shape[2] - 1)
        return out_ctx

    # ------------------------------------------------------------------ #
    # device-assign flow (fused step + species assign + redundancy in ONE
    # device program; host only decodes per-read records)
    def _dispatch_batch_full(self, names, a1, l1, a2=None, l2=None, cap=None,
                             path_width=None, win_frac=None, path_block=None,
                             combine_k=None):
        from ..models.flagship import fused_step_full, part_widths

        B = len(names)
        cap = cap or self.cap
        path_width = path_width or self._path_width
        win_frac = win_frac or self._win_frac
        path_block = path_block or self._path_block
        combine_k = combine_k or self._combine_k
        with self.timer.stage("dispatch"):
            r1, j1, r2, j2, l1, l2, paired, ra1, ra2 = \
                self._prep_arrays(a1, l1, a2, l2, B)
            lmax = r1.shape[1] + (r2.shape[1] + 3 if paired else 0)
            n_quot = lmax // int(self.taxonomer.dna_shift) + 2
            part_w = part_widths(r1.shape[1], r2.shape[1], paired,
                                 self.syncmer, self.kmer_format,
                                 self.smer_len, win_frac)
            records, packed2 = fused_step_full(
                r1, j1, r2, j2, self.db_quad,
                self.ef_node, self.euler, self.lca_depth, self.lca_lift,
                ra1=ra1, ra2=ra2,
                min_cons=int(self.params.min_cons_cnt),
                min_cons_euk=int(self.params.min_cons_cnt_euk),
                cap=cap, kmer_format=self.kmer_format,
                syncmer=self.syncmer, smer_len=self.smer_len, paired=paired,
                bucket_lo=self.bucket_lo, db_aa_lo=self.db_aa_lo,
                bucket_shift=self.bucket_shift, bucket_steps=self.bucket_steps,
                path_width=path_width, win_frac=win_frac,
                path_block=path_block,
                dp_pallas=getattr(self, "_dp_pallas", False),
                pallas_interpret=getattr(self, "_pallas_interpret", False),
                min_score=float(self.params.min_score),
                tie_ratio=float(self.params.tie_ratio),
                combine_k=combine_k, dna_shift=int(self.taxonomer.dna_shift),
                n_quot=n_quot, part_w=part_w,
                hash_table=self.hash_table,
                hash_log2_rows=self.hash_log2_rows,
                hash_chain=self.hash_chain, db_m=self.db_m,
                aligned=getattr(self, "_aligned", False),
                )
            for arr in (records, packed2):
                try:
                    arr.copy_to_host_async()
                except AttributeError:
                    pass
        return {
            "full": True, "names": names, "l1": l1, "l2": l2, "cap": cap,
            "a1": a1, "a2": a2, "path_width": path_width,
            "records": records, "pairs": packed2,
        }

    def _finish_full_phase1(self, ctx):
        """Fetch + decode the per-read record table; run the overflow
        retry protocol (same knobs as the host-scoring flow)."""
        from .taxonomer import ReadResult as RR

        with self.timer.stage("hdr_sync"):
            rec = np.asarray(ctx["records"])     # ONE blocking fetch
            st = rec[:5, 0]
        # recheck-all retry ladder carrying effective knobs (see
        # _finish_dp_phase1 for the rationale)
        eff_wf = None
        eff_cap = ctx["cap"]
        while True:
            if int(st[2]) > 0:                   # window compaction
                self._win_frac = min(self._win_frac + 24, 256)
                eff_wf = 256
            elif int(st[0]) > 0 and eff_cap < self._cap_ceiling:
                eff_cap = min(eff_cap * 2, self._cap_ceiling)
                self.cap = max(self.cap, eff_cap)
            elif int(st[3]) > 0:                 # blocked-packer lanes
                self._path_block *= 2
            elif int(st[1]) > ctx["path_width"]:  # path compaction width
                self._path_width = max(self._path_width,
                                       ctx["path_width"]) * 2
            elif int(st[4]) > 0:                 # combine_k run overflow
                self._combine_k *= 2
            else:
                break
            ctx = self._dispatch_batch_full(
                ctx["names"], ctx["a1"], ctx["l1"], ctx["a2"], ctx["l2"],
                cap=eff_cap, win_frac=eff_wf)
            rec = np.asarray(ctx["records"])
            st = rec[:5, 0]

        self._update_path_width(int(st[1]))
        names, l1, l2 = ctx["names"], ctx["l1"], ctx["l2"]
        B = len(names)
        lens1 = np.asarray(l1)
        lens2 = np.asarray(l2) if l2 is not None else np.zeros(B, np.int32)
        qlens = np.zeros(B + 1, dtype=np.int64)
        qlens[1:] = _max_covered(lens1) + np.where(
            lens2 > 0, _max_covered(lens2), 0)

        with self.timer.stage("score"):
            live = rec[0, 1:]
            tie = rec[1, 1:]
            tot = rec[2, 1:].astype(np.int32).view(np.float32)
            lca = rec[3, 1:]
            ft = rec[4, 1:]
            top = rec[5, 1:]
            ms = float(self.params.min_score)   # f64 compare, like the
            results = [RR() for _ in range(B)]  # host-scoring flow
            deferred = []
            for i in np.nonzero(live)[0]:
                res = results[i]
                res.species_scores = ()
                res.top_species = int(top[i])
                if tie[i] > 1:
                    sc_avg = tot[i] / np.float32(int(tie[i]))
                    res.score = float(sc_avg)
                    if sc_avg == 0 or sc_avg < ms:
                        continue
                    res.is_classified = True
                    res.classification = int(lca[i])
                    continue
                score = tot[i]
                if score == 0 or score < ms:
                    res.score = float(score)
                    continue
                deferred.append((int(i + 1), int(qlens[i + 1]), score,
                                 int(ft[i])))

        return {"names": names, "lens1": lens1, "lens2": lens2,
                "results": results, "deferred": deferred, "qlens": qlens,
                "pairs": ctx["pairs"], "prefix2": ctx["pairs"],
                "est2": ctx["pairs"].shape[1] - 1}

    def _finish_full_phase2(self, ctx):
        # identical pair decode + finish as the host-scoring flow
        return self._finish_dp_phase2(ctx)

    def _finish_partial(self, ctx):
        """Phase-1 finish for the 2-deep pipeline (host path: full finish)."""
        if ctx.get("full"):
            return {"dp2": True, "full": True,
                    "ctx": self._finish_full_phase1(ctx)}
        if ctx.get("dp"):
            return {"dp2": True, "ctx": self._finish_dp_phase1(ctx)}
        return {"dp2": False, "results": self._finish_batch_host(ctx)}

    def _finish_complete(self, part):
        if part["dp2"]:
            if part.get("full"):
                return self._finish_full_phase2(part["ctx"])
            return self._finish_dp_phase2(part["ctx"])
        return part["results"]

    def _dispatch_batch_host(self, names, a1, l1, a2=None, l2=None, cap=None):
        import jax.numpy as jnp

        from ..models.flagship import fused_step

        B = len(names)
        cap = cap or self.cap
        with self.timer.stage("dispatch"):
            # crop the batch to its own length bucket to bound device shapes
            l1 = np.minimum(np.asarray(l1, dtype=np.int32), a1.shape[1])
            lmax1 = _bucket_len(int(l1.max()) if B else 1)
            r1 = jnp.asarray(np.ascontiguousarray(a1[:, :lmax1]))
            j1 = jnp.asarray(l1)
            paired = a2 is not None
            if paired:
                l2 = np.minimum(np.asarray(l2, dtype=np.int32), a2.shape[1])
                lmax2 = _bucket_len(int(l2.max()) if B else 1)
                r2 = jnp.asarray(np.ascontiguousarray(a2[:, :lmax2]))
                j2 = jnp.asarray(l2)
            else:
                l2 = None
                r2 = jnp.zeros((B, 96), dtype=jnp.uint8)
                j2 = jnp.zeros(B, dtype=jnp.int32)
            packed, count, overflow = fused_step(
                r1, j1, r2, j2,
                self.db_values, self.db_taxids, self.db_species,
                cap=cap, kmer_format=self.kmer_format,
                syncmer=self.syncmer, smer_len=self.smer_len, paired=paired,
                bucket_lo=self.bucket_lo, db_aa_lo=self.db_aa_lo,
                bucket_shift=self.bucket_shift, bucket_steps=self.bucket_steps,
            )
            # start the device->host copy of an estimated match prefix NOW so
            # the transfer overlaps the host scoring of the previous batch
            est = min(self._fetch_estimate, packed.shape[1])
            prefix = packed[:, :est]
            try:
                prefix.copy_to_host_async()
            except AttributeError:
                pass
        return {
            "names": names, "l1": l1, "l2": l2, "cap": cap,
            "a1": a1, "a2": a2,
            "overflow": overflow, "packed": (packed, count),
            "prefix": prefix, "est": est,
        }

    def _finish_batch_host(self, ctx):
        from ..ops import compact_jax
        from .taxonomer import sort_matches

        # deferred overflow check: re-dispatch with a bigger cap if needed
        while int(ctx["overflow"]) > 0 and ctx["cap"] < self._cap_ceiling:
            cap = min(ctx["cap"] * 2, self._cap_ceiling)
            self.cap = max(self.cap, cap)
            ctx = self._dispatch_batch(ctx["names"], ctx["a1"], ctx["l1"],
                                       ctx["a2"], ctx["l2"], cap=cap)

        names, l1, l2 = ctx["names"], ctx["l1"], ctx["l2"]
        B = len(names)
        with self.timer.stage("fetch"):
            n = int(ctx["packed"][1])
            if n <= ctx["est"]:
                arr = np.asarray(ctx["prefix"])[:, :n]
            else:  # estimate too small; fall back to a full-prefix fetch
                arr = compact_jax.fetch_compacted(ctx["packed"])
            self._fetch_estimate = min(_pow2_bucket(int(n * 1.5), floor=1 << 15),
                                       ctx["packed"][0].shape[1])
        with self.timer.stage("decode+sort"):
            m = compact_jax.decode_matches(arr, MATCH_DTYPE)
            m = sort_matches(m)
        self.total_match_cnt += len(m)

        lens1 = np.asarray(l1)
        lens2 = np.asarray(l2) if l2 is not None else np.zeros(B, dtype=np.int32)
        qlens = np.zeros(B + 1, dtype=np.int64)
        qlens[1:] = _max_covered(lens1) + np.where(
            lens2 > 0, _max_covered(lens2), 0)
        with self.timer.stage("score"):
            read_results = self.taxonomer.classify_batch(m, qlens, B)
        results = []
        for i in range(B):
            qr = QueryRecord(names[i], int(lens1[i]), int(lens2[i]))
            qr.result = read_results[i]
            results.append(qr)
        return results

    # ------------------------------------------------------------------ #
    # long reads beyond the 64k row cap: overlapping chunk windows whose
    # match lists are globalized, ownership-deduped and concatenated
    # before the standard host scoring (SURVEY section 5.7; fixes the
    # silent truncation VERDICT r1 weak 5 called out)
    LONG_ROW_CAP = 1 << 16
    _LONG_CHUNK = 49152      # multiple of 3 (frame alignment across chunks)
    _LONG_OVERLAP = 48       # multiple of 3; > 27 so every window is
    #                          fully emitted by some chunk's local scan

    def _stream_probe_matches(self, arr, lens):
        """Raw MATCH_DTYPE rows for a batch of rows by probing the
        host-resident index ranges — the raw-match primitive the
        long-read chunk path uses under mesh and DB-streaming modes
        (each range is device_put for its pass and freed after, like
        _dispatch_batch_dp_stream).  AA-boundary range cuts make the
        per-range candidate sets disjoint and the min(2*minHamming, 7)
        cutoff computed in the owning range globally correct (reference
        KmerMatcher.cpp:1136)."""
        import jax.numpy as jnp

        from ..models.flagship import extract_queries_step, probe_range_step
        from ..ops.encode_jax import right_align

        B = arr.shape[0]
        r1, j1 = jnp.asarray(arr), jnp.asarray(lens)
        r2, j2, dra2 = self._dummy_mate2(B)
        ra1 = jnp.asarray(right_align(arr, lens)) if self._host_ra else None
        ra2 = dra2 if self._host_ra else None
        cap = self.cap
        while True:
            qk, qp, qf, qs, qv, _ = extract_queries_step(
                r1, j1, r2, j2, ra1, ra2, syncmer=self.syncmer,
                smer_len=self.smer_len, kmer_format=self.kmer_format,
                win_frac=256, paired=False)
            N = qk.shape[0]
            acc = (jnp.zeros((cap, N), bool),
                   jnp.zeros((cap, N), jnp.int32),
                   jnp.zeros((cap, N), jnp.int32),
                   jnp.zeros((cap, N), jnp.int32),
                   jnp.zeros((cap, N), jnp.int32),
                   jnp.zeros((cap, N), jnp.int32),
                   jnp.zeros((), jnp.int32))
            for r in range(self._n_ranges):
                quad_r = jnp.asarray(self._stream_quads[r])
                hash_r = jnp.asarray(self._stream_hts[r])
                acc = probe_range_step(
                    qk, qf, qv, quad_r, hash_r, *acc, cap=cap,
                    kmer_format=self.kmer_format,
                    hash_log2_rows=self.hash_log2_rows,
                    hash_chain=self.hash_chain)
                del quad_r, hash_r
            sel, ham, rh, ef, sp, dna, over = acc
            if int(over) == 0 or cap >= self._cap_ceiling:
                break
            cap = min(cap * 2, self._cap_ceiling)
            self.cap = max(self.cap, cap)
        sel_h = np.asarray(sel)
        c, n = np.nonzero(sel_h)
        m = np.zeros(len(c), MATCH_DTYPE)
        qs_h, qp_h, qf_h = np.asarray(qs), np.asarray(qp), np.asarray(qf)
        m["qid"] = qs_h[n]
        m["pos"] = qp_h[n].astype(np.uint32)
        m["frame"] = qf_h[n]
        # the quad payload carries euler-first coordinates (prefolded at
        # init); the host scorer wants node ids -> one euler gather back
        m["taxid"] = self.taxonomy.euler[np.asarray(ef)[c, n]]
        m["species"] = np.asarray(sp)[c, n] & np.int32(0x3FFFFFFF)
        m["dna"] = np.asarray(dna)[c, n].astype(np.uint32)
        m["rh"] = np.asarray(rh)[c, n].astype(np.uint16)
        m["ham"] = np.asarray(ham)[c, n].astype(np.uint8)
        return m

    def _classify_long_read(self, name: str, seq: str):
        """Classify ONE read of arbitrary length by chunked extraction.

        Chunk starts are multiples of 3, so a chunk-local window's codons
        are the read's codons and its global frame follows from its
        global position alone: forward frames have pos % 3 == frame
        (KmerScanner begin arithmetic, naive_oracle.naive_six_frames);
        reverse frames have begin (L%3 - r)%3.  Each window is OWNED by
        exactly one chunk (boundary at chunk_start + 21: the previous
        full chunk provably emits windows up to start + CHUNK - 27, the
        owner from start + 2), so overlap duplicates drop exactly.
        Matches then flow through the same host scorer as any batch.
        """
        import jax.numpy as jnp

        from ..models.flagship import fused_step
        from ..ops import compact_jax
        from .taxonomer import sort_matches

        resident = getattr(self, "db_values", None) is not None
        if self.params.mask_mode:
            seq = mask_ops.mask_low_complexity(seq, self.params.mask_prob)
        L = len(seq)
        CH, OV = self._LONG_CHUNK, self._LONG_OVERLAP
        step = CH - OV
        starts = list(range(0, max(L - OV, 1), step))
        n_ch = len(starts)
        own_lo = np.array([starts[i] + 21 if i else 0
                           for i in range(n_ch)], np.int64)
        own_hi = np.array([starts[i + 1] + 21 if i + 1 < n_ch else L
                           for i in range(n_ch)], np.int64)
        used_g = L - {0: 3, 1: 4, 2: 2}[L % 3]
        data = np.frombuffer(seq.encode("ascii", "replace"), np.uint8)

        all_m = []
        group = 8
        cap = self.cap
        for g0 in range(0, n_ch, group):
            grp = starts[g0:g0 + group]
            B = len(grp)
            lens = np.array([min(CH, L - a) for a in grp], np.int32)
            lmax = _bucket_len(int(lens.max()))
            arr = np.full((B, lmax), ord("N"), np.uint8)
            for i, a in enumerate(grp):
                arr[i, :lens[i]] = data[a:a + lens[i]]
            if resident:
                r1, j1 = jnp.asarray(arr), jnp.asarray(lens)
                r2 = jnp.zeros((B, 96), jnp.uint8)
                j2 = jnp.zeros(B, jnp.int32)
                while True:
                    packed, count, overflow = fused_step(
                        r1, j1, r2, j2, self.db_values, self.db_taxids,
                        self.db_species, cap=cap, kmer_format=self.kmer_format,
                        syncmer=self.syncmer, smer_len=self.smer_len,
                        paired=False, bucket_lo=self.bucket_lo,
                        db_aa_lo=self.db_aa_lo, bucket_shift=self.bucket_shift,
                        bucket_steps=self.bucket_steps)
                    if int(overflow) == 0 or cap >= self._cap_ceiling:
                        break
                    cap = min(cap * 2, self._cap_ceiling)
                    self.cap = max(self.cap, cap)
                m = compact_jax.decode_matches(
                    compact_jax.fetch_compacted((packed, count)), MATCH_DTYPE)
            else:
                # mesh / DB-streaming: probe the host-resident index
                # ranges (one range in HBM at a time)
                m = self._stream_probe_matches(arr, lens)
            if not len(m):
                continue
            gi = (g0 + m["qid"] - 1).astype(np.int64)
            pos_g = m["pos"].astype(np.int64) + np.asarray(grp, np.int64)[
                (m["qid"] - 1).astype(np.int64)]
            fwd = m["frame"] < 3
            fg = np.where(fwd, pos_g % 3,
                          3 + ((L % 3 - pos_g % 3) % 3)).astype(np.uint8)
            begin_g = np.where(fwd, fg.astype(np.int64),
                               (L % 3 - (fg.astype(np.int64) - 3)) % 3)
            keep = ((pos_g >= own_lo[gi]) & (pos_g < own_hi[gi])
                    & (pos_g <= begin_g + used_g - 24))
            m = m[keep].copy()
            m["qid"] = 1
            m["pos"] = pos_g[keep].astype(np.uint32)
            m["frame"] = fg[keep]
            all_m.append(m)

        m = (sort_matches(np.concatenate(all_m)) if all_m
             else np.zeros(0, MATCH_DTYPE))
        self.total_match_cnt += len(m)
        qlens = np.array([0, int(_max_covered(np.array([L]))[0])], np.int64)
        res = self.taxonomer.classify_batch(m, qlens, 1)[0]
        qr = QueryRecord(name, L)
        qr.result = res
        return qr

    def classify_file(self, path1, path2=None, progress=None):
        p2 = path2 if self.params.seq_mode == 2 else None

        try:
            from ..io import native_reader

            use_native = native_reader.available()
        except Exception:
            use_native = False

        if use_native:
            batches = self._read_batches_native(path1, p2)
            if self.params.mask_mode:
                # mask the padded rows in place (native tantan HMM) so
                # --mask 1 keeps the native-reader fast path
                prob = self.params.mask_prob

                def _mask_iter(it):
                    for names, a1, l1, a2, l2 in it:
                        a1 = mask_ops.mask_batch_rows(a1, l1, prob)
                        if a2 is not None:
                            a2 = mask_ops.mask_batch_rows(a2, l2, prob)
                        yield names, a1, l1, a2, l2

                batches = _mask_iter(batches)
        else:
            def _pad_iter():
                for names, s1, s2 in self._read_batches(path1, p2):
                    b1, bl1 = self._pad_batch(s1)
                    b2 = bl2 = None
                    if s2 is not None and any(x is not None for x in s2):
                        b2, bl2 = self._pad_batch(s2)
                    yield names, b1, bl1, b2, bl2

            batches = _pad_iter()

        # long-read mode: reads beyond the row cap are pulled out of the
        # batch pass (length zeroed -> unclassified placeholder) and
        # reprocessed whole via chunked extraction afterwards
        long_ids: dict = {}
        if self.params.seq_mode == 3:
            cap_rows = self.LONG_ROW_CAP

            def _split_long(it):
                base = 0
                for names, a1, l1, a2, l2 in it:
                    l1 = np.asarray(l1)
                    over = np.nonzero(l1 > cap_rows)[0]
                    if len(over):
                        l1 = l1.copy()
                        for i in over:
                            long_ids[base + int(i)] = True
                            l1[i] = 0
                    yield names, a1, l1, a2, l2
                    base += len(names)

            batches = _split_long(batches)
        results = self.drive_batches(batches, progress)
        if long_ids:
            for gi, rec in enumerate(read_seq_file(path1)):
                if gi in long_ids:
                    results[gi] = self._classify_long_read(rec.name, rec.seq)
        return results

    # -- degraded-link detection: the host-scoring flow fetches
    # ~0.5 MB/batch of emitted paths, which is free on a healthy link
    # (async copies land behind the 6-deep pipeline) but dominates wall
    # when the D2H path degrades (BENCH_r04: 280-460 ms blocking per
    # batch on a degraded tunnel).  Track an EMA of the blocking sync
    # cost; once it stays above _SYNC_SWITCH_S, flip to the
    # device-assign flow (ops/assign_jax), which keeps paths on device
    # and fetches only a [6, B+1] record table + pair prefix (~30 KB).
    # That flow costs ~10-15 ms extra device time, so it is a pure loss
    # on a healthy link (measured 35k -> 21k reads/s) — hence adaptive,
    # not default.  METABULI_DEVICE_ASSIGN=0/1 pins either flow.
    # Detector: MEDIAN of the last _SYNC_MIN_SAMPLES blocking-sync
    # times (a mean/EMA misfires on the one-off compile+upload stall of
    # the first batch, whose ~100 s sample would dominate any decay).
    _SYNC_SWITCH_S = 0.05
    _SYNC_MIN_SAMPLES = 12

    def _note_sync(self, dt: float):
        hist = getattr(self, "_sync_hist", None)
        if hist is None:
            from collections import deque

            hist = self._sync_hist = deque(maxlen=self._SYNC_MIN_SAMPLES)
        hist.append(dt)

    def _maybe_switch_device_assign(self):
        hist = getattr(self, "_sync_hist", ())
        if (getattr(self, "_device_assign", False)
                or not getattr(self, "_da_auto_ok", False)
                or len(hist) < self._SYNC_MIN_SAMPLES):
            return
        med = sorted(hist)[len(hist) // 2]
        if med < self._SYNC_SWITCH_S:
            return
        import sys as _sys

        # the full flow's first compile costs minutes through a degraded
        # link — compile it in a BACKGROUND thread (jax compiles with the
        # GIL released; the persistent cache makes the later in-loop
        # "recompile" a disk hit) and keep the host flow flowing until
        # it is ready, then flip atomically
        state = getattr(self, "_da_state", "off")
        if state == "off" and getattr(self, "_last_batch", None):
            import threading

            print(f"# degraded D2H link detected (median blocking sync "
                  f"{med * 1e3:.0f} ms over {len(hist)} fetches) — "
                  f"compiling the device-assign flow in the background",
                  file=_sys.stderr)
            self._da_state = "compiling"
            # non-daemon ON PURPOSE: a daemon thread mid-XLA-compile at
            # interpreter teardown aborts the process; a short-workload
            # exit instead joins the compile (one-time — it populates
            # the persistent cache, so the NEXT run switches instantly)
            self._da_thread = threading.Thread(
                target=self._compile_full_flow, args=self._last_batch)
            self._da_thread.start()
        elif state == "ready":
            print("# device-assign flow ready — switching", file=_sys.stderr)
            self._device_assign = True
            self._da_auto_ok = False

    def _compile_full_flow(self, names, a1, l1, a2, l2):
        """Background-thread warmup of the device-assign flow: dispatch a
        duplicate of a real batch through fused_step_full and force its
        compile + one execution (~one extra device step on the in-order
        queue).  No retry-ladder / sticky-knob mutation here — overflow
        stats in the throwaway result are ignored."""
        try:
            ctx = self._dispatch_batch_full(names, a1, l1, a2, l2)
            np.asarray(ctx["records"][:1, :1])
            self._da_state = "ready"
        except Exception as e:   # pragma: no cover - defensive
            import sys as _sys

            print(f"# device-assign background compile failed ({e!r}); "
                  f"staying on the host flow", file=_sys.stderr)
            self._da_state = "failed"
            self._da_auto_ok = False

    # software-pipeline depth per phase: how many batches sit between a
    # dispatch and its phase-1 finish (and between phase 1 and phase 2).
    # Each blocking device->host fetch pays a ~32 ms round trip through
    # the tunnel unless its async copy has had several iterations to
    # land; measured reads/s on the bench climbs 24.3k -> 30.9k -> 32.1k
    # -> 33.4k for depths 2/3/4/6 and flattens after (device saturated).
    # Cost: ~40 MB of resident device tensors per in-flight batch.
    PIPE_DEPTH = 6

    def drive_batches(self, batches, progress=None):
        """Deep software pipeline over (names, a1, l1, a2, l2) batches.

        Depth 1 (the reference's master/worker IO overlap,
        KmerExtractor.cpp:113-193, recast as async dispatch) hides host
        scoring behind the device steps of later batches.  Phase-2
        results are collected PIPE_DEPTH iterations after their
        redundancy kernel is enqueued so every async device->host copy
        has several iterations to land before its blocking fetch.

        DB-range streaming mode uses the grouped driver instead: the
        heavy per-sweep cost there is re-uploading index ranges, so
        batches are grouped to share each sweep.
        """
        from collections import deque

        if getattr(self, "_streaming", False):
            return self._drive_batches_stream(batches, progress)
        all_results = []
        done = 0
        depth = self.PIPE_DEPTH
        pend1: deque = deque()   # dispatched, awaiting phase 1
        pend2: deque = deque()   # phase-1 done, awaiting phase 2
        for names, a1, l1, a2, l2 in batches:
            self._last_batch = (names, a1, l1, a2, l2)
            self._maybe_switch_device_assign()
            ctx = self._dispatch_batch(names, a1, l1, a2, l2)
            while len(pend2) >= depth:
                res = self._finish_complete(pend2.popleft())
                all_results.extend(res)
                done += len(res)
                if progress:
                    progress(done)
            pend1.append(ctx)
            if len(pend1) > depth:
                pend2.append(self._finish_partial(pend1.popleft()))
        while pend1:
            pend2.append(self._finish_partial(pend1.popleft()))
        while pend2:
            res = self._finish_complete(pend2.popleft())
            all_results.extend(res)
            done += len(res)
            if progress:
                progress(done)
        return all_results

    def _drive_batches_stream(self, batches, progress=None):
        """Streaming-mode driver: dispatch GROUPS of batches through
        shared range sweeps (_dispatch_group_stream); the previous
        group's finishes run while the next group's sweep occupies the
        device, so the host scoring hides behind the uploads."""
        all_results = []
        done = 0
        G = self._stream_group_size()
        group: list = []
        prev_ctxs: list = []

        def finish_prev():
            nonlocal prev_ctxs, done
            for c in prev_ctxs:
                res = self._finish_batch(c)
                all_results.extend(res)
                done += len(res)
                if progress:
                    progress(done)
            prev_ctxs = []

        def flush(group):
            nonlocal prev_ctxs
            # finish BEFORE dispatching: any overflow retry in the
            # previous group updates the sticky knobs (cap, win_frac,
            # path_block, path_width) that the NEXT group's dispatch
            # reads — dispatching first would send the whole group with
            # stale knobs and each member would pay its own single-batch
            # retry sweep (measured 7x streaming regression, r4)
            finish_prev()
            prev_ctxs = self._dispatch_group_stream(group)

        first = True
        for b in batches:
            group.append(b)
            # the first batch goes SOLO so its retries settle the
            # adaptive knobs before a full group commits to them
            if first or len(group) >= G:
                flush(group)
                group = []
                first = False
        if group:
            flush(group)
        finish_prev()
        return all_results
