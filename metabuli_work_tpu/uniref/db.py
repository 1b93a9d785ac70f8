"""UniRef k-mer database build (`create-uniref-db`).

Reference: UnirefDbCreator + IndexCreator::createLcaKmerIndex
(IndexCreator.cpp:74-149): AA 12-mers from every protein sequence,
labeled with the protein's UniRef100 cluster id; duplicate k-mer values
collapse to the LCA over the 4-level cluster tree (FilterMode::
UNIREF_LCA, IndexCreator.h:541-580).
"""

import json
import os
import time

import numpy as np

from ..io.fasta import read_fasta
from ..ops.encode_aa import extract_protein_kmers
from .tree import UnirefTree


def _entry_cluster_name(header_name: str) -> str:
    """FASTA id -> UniRef100 cluster name (ids are 'UniRef100_...')."""
    return header_name if header_name.startswith("UniRef") else "UniRef100_" + header_name


def build_uniref_db(db_dir, protein_fasta, tree_path, k: int = 12,
                    syncmer: bool = False, smer_len: int = 5):
    tree = UnirefTree.load(tree_path)
    values, ids = [], []
    n_seq = n_skipped = 0
    for rec in read_fasta(protein_fasta):
        cid = tree.name2id.get(_entry_cluster_name(rec.name)) or tree.name2id.get(rec.name)
        if cid is None:
            n_skipped += 1
            continue
        km, _ = extract_protein_kmers(rec.seq, k=k, syncmer=syncmer, smer_len=smer_len)
        if not len(km):
            continue
        values.append(km)
        ids.append(np.full(len(km), cid, dtype=np.int64))
        n_seq += 1

    if values:
        v = np.concatenate(values)
        t = np.concatenate(ids)
    else:
        v = np.zeros(0, np.uint64)
        t = np.zeros(0, np.int64)

    order = np.lexsort((t, v))
    v, t = v[order], t[order]
    first = np.ones(len(v), dtype=bool)
    first[1:] = v[1:] != v[:-1]
    group = np.cumsum(first) - 1
    out_v = v[first]
    # grouped LCA over the 4-level tree
    out_ids = t[first].copy()
    if len(v):
        dup = ~first
        for i in np.nonzero(dup)[0]:
            g = group[i]
            out_ids[g] = tree.lca_pair(out_ids[g], t[i])

    os.makedirs(db_dir, exist_ok=True)
    np.save(os.path.join(db_dir, "kmers.npy"), out_v)
    np.save(os.path.join(db_dir, "infos.npy"), out_ids.astype(np.int64))
    tree.save(os.path.join(db_dir, "uniref_tree.npz"))
    with open(os.path.join(db_dir, "db.meta.json"), "w") as f:
        json.dump({
            "db_type": "uniref",
            "kmer_format": 4,
            "kmer_len": k,
            "syncmer": syncmer,
            "smer_len": smer_len,
            "kmer_count": int(len(out_v)),
            "sequences": n_seq,
            "creation_date": time.strftime("%Y-%m-%d"),
        }, f, indent=2)
    print(f"create-uniref-db: {len(out_v)} k-mers from {n_seq} proteins "
          f"({n_skipped} without cluster) -> {db_dir}")
    return out_v, out_ids
