"""DB-build parity with real Prodigal gene prediction (VERDICT r1 item 6).

Builds the SAME genomes into a DB twice — once with the reference C++
binary (vendored Prodigal + ProdigalWrapper::getExtendedORFs,
reference IndexCreator.cpp:1124-1212) and once with this framework's
build_database(orf_prediction=True, gene_predictor='prodigal')
(native/prodigal_api.cpp over the same vendored library +
index/prodigal.get_extended_orfs) — and asserts the resulting k-mer
sets are IDENTICAL: same metamer values, same (original-space) taxid
labels, entry for entry.

Exercises: per-species training on the longest sequence, the evolving
intergenic 23-mer hash list across a species' contigs, min-hash
strandness checks with reverse-complement re-prediction, multi-strain
LCA dedup.

Skipped when the reference sources or a C++ toolchain are unavailable.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
BUILD_DIR = os.path.join(REPO, "reference_build")
BINARY = os.path.join(BUILD_DIR, "build", "metabuli")

rng = np.random.default_rng(1234)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE) or shutil.which("g++") is None,
    reason="reference sources or C++ toolchain unavailable")


@pytest.fixture(scope="module")
def ref_binary():
    if not os.path.exists(BINARY):
        r = subprocess.run(["make", "-j8"], cwd=BUILD_DIR,
                           capture_output=True, timeout=1200)
        if r.returncode != 0:
            pytest.skip(f"reference binary build failed:\n"
                        f"{r.stderr.decode(errors='replace')[-2000:]}")
    return BINARY


def _write_taxdump(d):
    d.mkdir()
    nodes = [(1, 1, "no rank"), (131567, 1, "no rank"),
             (2, 131567, "superkingdom"), (10, 2, "genus"),
             (100, 10, "species"), (200, 10, "species"),
             (101, 100, "strain"), (102, 100, "strain"),
             (201, 200, "strain")]
    with open(d / "nodes.dmp", "w") as f:
        for t, p, r in nodes:
            f.write(f"{t}\t|\t{p}\t|\t{r}\t|\t\t|\t0\t|\t0\t|\t0\t|\t0\t|"
                    f"\t0\t|\t0\t|\t0\t|\t\t|\n")
    with open(d / "names.dmp", "w") as f:
        for t, _, _ in nodes:
            f.write(f"{t}\t|\tnode{t}\t|\t\t|\tscientific name\t|\n")
    (d / "merged.dmp").write_text("")


def _mutate(seq, rate, rng):
    arr = np.frombuffer(seq.encode(), dtype=np.uint8).copy()
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    mut = rng.random(len(arr)) < rate
    arr[mut] = rng.choice(acgt, size=int(mut.sum()))
    return arr.tobytes().decode()


@pytest.fixture(scope="module")
def inputs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("prodigal_parity")
    _write_taxdump(tmp / "taxdump")

    # species 100: training genome GA (150 kb, strain 101), a second
    # strain contig GB (40 kb slice at 1% divergence, strain 102), and a
    # REVERSE-COMPLEMENTED slice GC (50 kb, strain 101) to trigger the
    # min-hash strandness path.  species 200: one genome GD (120 kb).
    from metabuli_work_tpu.index.prodigal import reverse_complement

    ga = "".join(rng.choice(list("ACGT"), 150_000))
    gb = _mutate(ga[20_000:60_000], 0.01, rng)
    gc = reverse_complement(ga[70_000:120_000])
    gd = "".join(rng.choice(list("ACGT"), 120_000))

    fa1 = tmp / "sp100.fna"
    fa1.write_text(f">GA\n{ga}\n>GB\n{gb}\n>GC\n{gc}\n")
    fa2 = tmp / "sp200.fna"
    fa2.write_text(f">GD\n{gd}\n")
    (tmp / "fastas.txt").write_text(f"{fa1}\n{fa2}\n")
    (tmp / "acc2taxid.map").write_text(
        "accession\taccession.version\ttaxid\tgi\n"
        "GA\tGA.1\t101\t0\nGB\tGB.1\t102\t0\nGC\tGC.1\t101\t0\n"
        "GD\tGD.1\t201\t0\n")
    return tmp


def test_prodigal_db_build_parity(ref_binary, inputs):
    from metabuli_work_tpu.index.builder import build_database
    from metabuli_work_tpu.index.format import load_reference_db

    tmp = inputs
    refdb = tmp / "REFDB"
    refdb.mkdir()
    r = subprocess.run(
        [ref_binary, "build", str(refdb), str(tmp / "fastas.txt"),
         str(tmp / "acc2taxid.map"), "--taxonomy-path",
         str(tmp / "taxdump"), "--mask", "0"],
        capture_output=True, timeout=1800)
    assert r.returncode == 0, r.stdout.decode(errors="replace")[-2000:]

    mydb = tmp / "MYDB"
    mine = build_database(
        str(mydb), str(tmp / "fastas.txt"), str(tmp / "acc2taxid.map"),
        str(tmp / "taxdump"), syncmer=False, mask_mode=0,
        orf_prediction=True, gene_predictor="prodigal")

    ref = load_reference_db(str(refdb))
    assert ref.size > 10_000, "reference DB suspiciously small"

    ref_orig = np.asarray(
        [ref.taxonomy.orig_of(t) for t in ref.taxids], dtype=np.int64)
    my_orig = np.asarray(
        [mine.taxonomy.orig_of(t) for t in mine.taxids], dtype=np.int64)

    ref_pairs = np.stack([ref.values.astype(np.uint64),
                          ref_orig.astype(np.uint64)], axis=1)
    my_pairs = np.stack([mine.values.astype(np.uint64),
                         my_orig.astype(np.uint64)], axis=1)
    # canonical order: both sides sorted by (value, taxid)
    ref_pairs = ref_pairs[np.lexsort((ref_pairs[:, 1], ref_pairs[:, 0]))]
    my_pairs = my_pairs[np.lexsort((my_pairs[:, 1], my_pairs[:, 0]))]

    if ref_pairs.shape != my_pairs.shape or not (ref_pairs == my_pairs).all():
        ref_set = set(map(tuple, ref_pairs))
        my_set = set(map(tuple, my_pairs))
        only_ref = list(ref_set - my_set)[:5]
        only_my = list(my_set - ref_set)[:5]
        pytest.fail(
            f"k-mer sets differ: ref {ref_pairs.shape[0]} vs "
            f"mine {my_pairs.shape[0]}; "
            f"only-ref {only_ref}; only-mine {only_my}")


def test_prodigal_strandness_reversal(inputs):
    """The reverse-complemented contig GC must be detected as
    opposite-strand vs the species training sequence (reference
    IndexCreator.cpp:1158-1160 min-hash check)."""
    from metabuli_work_tpu.index.minhash import (minhash_sketch,
                                                 minhash_similar)
    from metabuli_work_tpu.io.fasta import read_fasta

    tmp = inputs
    recs = {r.name: r.seq for r in read_fasta(str(tmp / "sp100.fna"))}
    tsk = minhash_sketch(recs["GA"])
    assert minhash_similar(tsk, minhash_sketch(recs["GB"]),
                           len(recs["GA"]), len(recs["GB"]))
    assert not minhash_similar(tsk, minhash_sketch(recs["GC"]),
                               len(recs["GA"]), len(recs["GC"]))
