"""GOLDEN parity vs the reference C++ binary (VERDICT r1 item 4).

Builds the actual Metabuli reference binary from /root/reference sources
against the from-scratch mmseqs shim (reference_build/), has IT build a
DB (real Prodigal gene prediction; genomes >= 100 kb so single-genome
training needs no metagenome training data) and classify reads, then
classifies the SAME reads with THIS framework against the IMPORTED
reference DB — asserting 100% per-read agreement: classified flag,
taxID, rank, score (<= 5e-6: the TSV carries 6 significant digits),
taxID:match_count sets, and the reported query_length.

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

rng = np.random.default_rng(97)

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


@pytest.fixture(scope="module")
def golden(ref_binary, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("golden")
    d = tmp / "taxdump"
    d.mkdir()
    nodes = [(1, 1, "no rank"), (131567, 1, "no rank"),
             (2, 131567, "superkingdom"), (10, 2, "genus"),
             (100, 10, "species"), (200, 10, "species"),
             (101, 100, "strain"), (201, 200, "strain")]
    with open(d / "nodes.dmp", "w") as f:
        for t, p, r in nodes:
            # full NCBI column count so the rank field parses cleanly
            f.write(f"{t}\t|\t{p}\t|\t{r}\t|\t\t|\t0\t|\t0\t|\t0\t|\t0\t|"
                    f"\t0\t|\t0\t|\t0\t|\t\t|\n")
    names = {1: "root", 131567: "cellular organisms", 2: "Bacteria",
             10: "TestGenus", 100: "Species one", 200: "Species two",
             101: "Strain one", 201: "Strain two"}
    with open(d / "names.dmp", "w") as f:
        for t, n in names.items():
            f.write(f"{t}\t|\t{n}\t|\t\t|\tscientific name\t|\n")
    (d / "merged.dmp").write_text("")

    genomes = {}
    for acc, tid in [("GA", 101), ("GB", 201)]:
        # >= 100 kb: Prodigal trains on the sequence itself
        genomes[acc] = "".join(rng.choice(list("ACGT"), 150000))
        (tmp / f"{acc}.fna").write_text(f">{acc}\n{genomes[acc]}\n")
    (tmp / "fastas.txt").write_text(
        f"{tmp}/GA.fna\n{tmp}/GB.fna\n")
    (tmp / "acc2taxid.map").write_text(
        "accession\taccession.version\ttaxid\tgi\n"
        "GA\tGA.1\t101\t0\nGB\tGB.1\t201\t0\n")

    comp = {"A": "T", "T": "A", "C": "G", "G": "C"}
    with open(tmp / "reads.fq", "w") as f:
        for i in range(200):
            acc = "GA" if i % 2 == 0 else "GB"
            g = genomes[acc]
            s = int(rng.integers(0, len(g) - 151))
            seq = g[s:s + 149 + (i % 3)]     # mixed L % 3 classes
            if rng.random() < 0.5:
                seq = "".join(comp[c] for c in reversed(seq))
            f.write(f"@r{i}\n{seq}\n+\n{'I' * len(seq)}\n")
        for i in range(20):
            f.write(f"@rand{i}\n{''.join(rng.choice(list('ACGT'), 150))}\n"
                    f"+\n{'I' * 150}\n")

    db = tmp / "REFDB"
    db.mkdir()
    r = subprocess.run(
        [ref_binary, "build", str(db), str(tmp / "fastas.txt"),
         str(tmp / "acc2taxid.map"), "--taxonomy-path", str(d),
         "--mask", "0"],
        capture_output=True, timeout=900)
    assert r.returncode == 0, r.stdout.decode(errors="replace")[-2000:]
    out = tmp / "REFOUT"
    out.mkdir()
    r = subprocess.run(
        [ref_binary, "classify", str(tmp / "reads.fq"), str(db), str(out),
         "gold", "--seq-mode", "1", "--min-score", "0.15",
         "--min-sp-score", "0.5", "--max-ram", "8", "--threads", "4"],
        capture_output=True, timeout=900)
    assert r.returncode == 0, r.stdout.decode(errors="replace")[-2000:]
    return tmp, db, out


def _parse_ref_tsv(path):
    ref = {}
    for line in open(path):
        if line.startswith("#"):
            continue
        c = line.rstrip("\n").split("\t")
        taxcnt = {}
        if len(c) > 6 and c[6].strip() not in ("-", ""):
            for tok in c[6].split():
                t, n = tok.split(":")
                taxcnt[int(t)] = int(n)
        ref[c[1]] = (int(c[0]), int(c[2]), int(c[3]), float(c[4]), c[5],
                     taxcnt)
    return ref


def test_golden_classify_agreement(golden):
    from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams

    tmp, db, out = golden
    ref = _parse_ref_tsv(out / "gold_classifications.tsv")
    assert sum(1 for v in ref.values() if v[0]) >= 180, \
        "reference must classify most reads"

    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=64)
    clf = Classifier(str(db), params)
    results = clf.classify_file(str(tmp / "reads.fq"))
    tax = clf.taxonomy
    assert len(results) == len(ref)

    mismatches = []
    for qr in results:
        r = qr.result
        cls = tax.orig_of(r.classification) if r.is_classified else 0
        rank = tax.rank_of(r.classification) if r.is_classified else "-"
        cnt = {int(tax.orig_of(t)): int(n)
               for t, n in (r.tax_cnt or {}).items()} \
            if getattr(r, "tax_cnt", None) else {}
        w = ref[qr.name]
        ok = (int(r.is_classified) == w[0] and cls == w[1]
              and qr.covered_length == w[2]
              and abs(float(np.float32(r.score)) - w[3]) <= 5e-6
              and (not w[0] or (rank == w[4] and cnt == w[5])))
        if not ok:
            mismatches.append((qr.name, int(r.is_classified), cls,
                               qr.covered_length, float(r.score), rank,
                               cnt, w))
    assert not mismatches, \
        f"{len(mismatches)} reads disagree; first: {mismatches[:3]}"


def test_golden_report_agreement(golden):
    """Kraken-style report: clade counts per taxid must agree."""
    from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams
    from metabuli_work_tpu.report import reporter

    tmp, db, out = golden
    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=64)
    clf = Classifier(str(db), params)
    results = clf.classify_file(str(tmp / "reads.fq"))
    my_out = tmp / "MYOUT"
    reporter.write_all(str(my_out), "gold", results, clf.taxonomy)

    def parse_report(path):
        rows = {}
        for line in open(path):
            c = line.rstrip("\n").split("\t")
            if len(c) >= 5 and not line.startswith("#"):
                rows[int(c[4]) if c[4].lstrip("-").isdigit() else c[4]] = (
                    float(c[0]), int(c[1]), int(c[2]))
        return rows

    ref_rows = parse_report(out / "gold_report.tsv")
    my_rows = parse_report(my_out / "gold_report.tsv")
    for key, (prop, clade, taxon) in ref_rows.items():
        assert key in my_rows, f"taxid {key} missing from our report"
        mp, mc, mt = my_rows[key]
        assert (mc, mt) == (clade, taxon), \
            f"taxid {key}: clade/taxon {mc}/{mt} != reference {clade}/{taxon}"
        assert abs(mp - prop) < 0.01
