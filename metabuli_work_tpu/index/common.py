"""Common-k-mer database: AA 12-mers shared by >= 2 species.

Reference: IndexCreator::createCommonKmerIndex (IndexCreator.cpp:231-314)
with FilterMode::COMMON_KMER (IndexCreator.h:538-565): extract dna2aa
12-mers from every reference sequence (six frames, target-style frame
ranges — KmerExtractor::extractKmer_dna2aa, KmerExtractor.cpp:388-418),
sort by (value, species), and keep values observed in more than one
species.  The resulting sorted value list feeds the read-group
pipeline's filterCommonKmers.  Output: kmers.npy (sorted u64 values) +
infos.npy (LCA taxid per value) + db.meta.json.
"""

import json
import os
import time

import numpy as np

from ..io.fasta import read_fasta
from ..ops.encode_np import scan_frame
from ..ops.genetic_code import seq_to_codes
from ..taxonomy import Taxonomy
from .builder import load_acc2taxid


def extract_target_aa_kmers(seq: str, k: int = 12, syncmer: bool = False,
                            smer_len: int = 5) -> np.ndarray:
    """Six-frame AA k-mers, target-style frame ranges."""
    codes = seq_to_codes(seq)
    L = len(codes)
    out = []
    for frame in range(6):
        fwd = frame < 3
        if fwd:
            begin, end = frame, L - 1
        else:
            begin, end = 0, L - 1 - (frame % 3)
        used = end - begin + 1
        if used < 3 * k:
            continue
        fk = scan_frame(codes, begin, used, fwd, syncmer=syncmer,
                        smer_len=smer_len, k=k, aa_only=True)
        out.append(fk.kmers)
    return np.concatenate(out) if out else np.zeros(0, np.uint64)


def build_common_kmer_db(
    db_dir,
    fasta_list_path,
    acc2taxid_path,
    taxdump_dir,
    k: int = 12,
    syncmer: bool = False,
    smer_len: int = 5,
):
    taxonomy = Taxonomy.from_taxdump(taxdump_dir)
    acc2taxid = load_acc2taxid(acc2taxid_path)
    with open(fasta_list_path) as f:
        fasta_files = [ln.strip() for ln in f if ln.strip()]

    values, taxids, species = [], [], []
    for fa in fasta_files:
        for rec in read_fasta(fa):
            acc = rec.name.split(".")[0]
            taxid = acc2taxid.get(acc) or acc2taxid.get(rec.name)
            if taxid is None:
                continue
            internal = taxonomy.to_internal(taxid)
            if internal == 0:
                continue
            km = extract_target_aa_kmers(rec.seq, k, syncmer, smer_len)
            if not len(km):
                continue
            sp = int(taxonomy.species_of(internal)) or internal
            values.append(km)
            taxids.append(np.full(len(km), internal, dtype=np.int32))
            species.append(np.full(len(km), sp, dtype=np.int32))

    if values:
        v = np.concatenate(values)
        t = np.concatenate(taxids)
        s = np.concatenate(species)
    else:
        v = np.zeros(0, np.uint64)
        t = np.zeros(0, np.int32)
        s = np.zeros(0, np.int32)

    order = np.lexsort((t, s, v))
    v, t, s = v[order], t[order], s[order]
    # unique (value, species)
    first = np.ones(len(v), dtype=bool)
    first[1:] = (v[1:] != v[:-1]) | (s[1:] != s[:-1])
    vu, tu, su = v[first], t[first], s[first]
    # values appearing with >= 2 species
    new_val = np.ones(len(vu), dtype=bool)
    new_val[1:] = vu[1:] != vu[:-1]
    val_id = np.cumsum(new_val) - 1
    n_vals = int(val_id[-1]) + 1 if len(vu) else 0
    sp_count = np.bincount(val_id, minlength=n_vals)
    common = sp_count >= 2

    keep_first = new_val & common[val_id]
    out_values = vu[keep_first]
    group_ids = val_id[common[val_id]]
    remap = np.cumsum(common) - 1
    out_taxids = taxonomy.lca_reduce(tu[common[val_id]], remap[group_ids], int(common.sum()) or 0)

    os.makedirs(db_dir, exist_ok=True)
    np.save(os.path.join(db_dir, "kmers.npy"), out_values)
    np.save(os.path.join(db_dir, "infos.npy"), out_taxids.astype(np.int32))
    taxonomy.save(os.path.join(db_dir, "taxonomy.npz"))
    with open(os.path.join(db_dir, "db.meta.json"), "w") as f:
        json.dump({
            "db_type": "common_kmer",
            "kmer_format": 5 if syncmer else 3,
            "kmer_len": k,
            "syncmer": syncmer,
            "smer_len": smer_len,
            "kmer_count": int(len(out_values)),
            "creation_date": time.strftime("%Y-%m-%d"),
        }, f, indent=2)
    print(f"common-kmer DB: {len(out_values)} shared k-mers "
          f"(of {n_vals} distinct) -> {db_dir}")
    return out_values
