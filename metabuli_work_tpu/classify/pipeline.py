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
from dataclasses import dataclass, field
from typing import Iterator, List, Optional

import numpy as np

from ..index.format import KmerIndex, load_index
from ..io.fasta import read_seq_file
from ..ops import encode_jax, match_jax
from ..ops import mask as mask_ops
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


@dataclass
class QueryRecord:
    name: str
    length1: int
    length2: int = 0
    result: Optional[ReadResult] = None

    @property
    def total_length(self):
        return self.length1 + self.length2


def _bucket_len(n: int, quantum: int = 96) -> int:
    return max(quantum, quantum * math.ceil(n / quantum))


class Classifier:
    def __init__(self, db_dir, params: ClassifyParams):
        import jax.numpy as jnp

        self.params = params
        self.index: KmerIndex = load_index(db_dir)
        self.taxonomy = self.index.taxonomy
        meta = self.index.meta
        self.kmer_format = int(meta.get("kmer_format", 2))
        self.syncmer = bool(meta.get("syncmer", False))
        self.smer_len = int(meta.get("smer_len", 5))
        self.db_values = jnp.asarray(self.index.values)
        self.db_taxids = jnp.asarray(self.index.taxids.astype(np.int32))
        self.db_species = jnp.asarray(self.index.species.astype(np.int32))
        self.cap = int(min(max(self.index.max_aa_run(), 8), params.max_cap))
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
            accession_level=params.accession_level,
            em=params.em,
        )
        self.total_match_cnt = 0

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

        cap = max(self.params.long_read_chunk, 4096)
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
        import jax.numpy as jnp

        B = len(names)
        seq_ids = jnp.arange(1, B + 1, dtype=jnp.int32)

        # crop the batch to its own length bucket to bound device shapes
        l1 = np.minimum(np.asarray(l1, dtype=np.int32), a1.shape[1])
        lmax1 = _bucket_len(int(l1.max()) if B else 1)
        k1, p1, v1 = self._extract_arrays(np.ascontiguousarray(a1[:, :lmax1]), l1)
        parts = [encode_jax.flatten_batch(k1, p1, v1, seq_ids)]
        if a2 is not None:
            l2 = np.minimum(np.asarray(l2, dtype=np.int32), a2.shape[1])
            lmax2 = _bucket_len(int(l2.max()) if B else 1)
            # mate-2 positions are offset by len1 + 3 (KmerExtractor.cpp:341-345)
            k2, p2, v2 = self._extract_arrays(
                np.ascontiguousarray(a2[:, :lmax2]), l2, pos_offsets=l1 + 3)
            parts.append(encode_jax.flatten_batch(k2, p2, v2, seq_ids))
        else:
            l2 = None

        q_kmers = jnp.concatenate([p[0] for p in parts])
        q_pos = jnp.concatenate([p[1] for p in parts])
        q_frames = jnp.concatenate([p[2] for p in parts])
        q_sids = jnp.concatenate([p[3] for p in parts])
        q_valid = jnp.concatenate([p[4] for p in parts])

        from ..ops import compact_jax

        cap = self.cap
        while True:
            out = self._probe(q_kmers, q_frames, q_valid, cap)
            if int(out["overflow"]) == 0 or cap >= self.index.max_aa_run():
                break
            cap = min(cap * 2, self.index.max_aa_run())
        self.cap = max(self.cap, cap)

        # device-side pack + compact; host pulls only the match prefix,
        # decodes with vectorized shifts, and applies compareMatches order
        from .taxonomer import sort_matches

        packed = compact_jax.compact_and_sort(out, q_pos, q_frames, q_sids)
        arr = compact_jax.fetch_compacted(packed)
        m = compact_jax.decode_matches(arr, MATCH_DTYPE)
        m = sort_matches(m)
        self.total_match_cnt += len(m)

        lens1 = np.asarray(l1)
        lens2 = np.asarray(l2) if l2 is not None else np.zeros(B, dtype=np.int32)
        qlens = np.zeros(B + 1, dtype=np.int64)
        qlens[1:] = lens1 + lens2
        read_results = self.taxonomer.classify_batch(m, qlens, B)
        results = []
        for i in range(B):
            qr = QueryRecord(names[i], int(lens1[i]), int(lens2[i]))
            qr.result = read_results[i]
            results.append(qr)
        return results

    # ------------------------------------------------------------------ #
    def classify_file(self, path1, path2=None, progress=None):
        all_results = []
        done = 0
        p2 = path2 if self.params.seq_mode == 2 else None

        use_native = not self.params.mask_mode
        if use_native:
            try:
                from ..io import native_reader

                use_native = native_reader.available()
            except Exception:
                use_native = False

        if use_native:
            for names, a1, l1, a2, l2 in self._read_batches_native(path1, p2):
                res = self.classify_batch_arrays(names, a1, l1, a2, l2)
                all_results.extend(res)
                done += len(res)
                if progress:
                    progress(done)
        else:
            for names, s1, s2 in self._read_batches(path1, p2):
                res = self.classify_batch(names, s1, s2)
                all_results.extend(res)
                done += len(res)
                if progress:
                    progress(done)
        return all_results
