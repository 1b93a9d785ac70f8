"""GOLDEN parity MATRIX vs the reference C++ binary (VERDICT r2 item 1).

test_golden_reference.py proves per-read agreement for ONE configuration
(single-end, mask=0, non-syncmer).  The reference surface is a matrix;
this module diffs the remaining cells against the actual binary, each on
ORF-RICH synthetic genomes (realistic codon usage, real start/stop
structure — not uniform-random DNA, so Prodigal's gene models and the
extended-ORF/intergenic machinery run on typical inputs):

  - paired-end          (--seq-mode 2, the reference classify default,
                         /root/reference/src/workflow/classify.cpp:12)
  - syncmer DB          (--syncmer 1, SyncmerScanner.h:9-103): DB
                         contents k-mer-for-k-mer AND classifications
  - masked build        (--mask 1, the reference build default,
                         workflow/build.cpp:21): DB contents — proves
                         native/tantan_mask.cpp == shim/tantan.cpp —
                         AND classifications on the masked DB
  - masked queries      (classify --mask 1: query-side tantan parity)
  - long reads          (--seq-mode 3, Taxonomer.cpp:44-48)
  - EM                  (--em: mapping_results binary + EM reports,
                         Classifier.cpp:210-388)
  - updateDB            (incremental merge + new-taxa graft,
                         workflow/updateDB.cpp:36-158)
  - accession-level     (--accession-level 1, IndexCreator.cpp:196-200)
  - extract             (Reporter.cpp:296-415)
  - classifiedRefiner   (src/util/classifiedRefiner.cpp)

`filter` has NO golden cell by design: the reference's QueryFilter is
gutted upstream — its contaminant-matching loop is a placeholder
(`for (auto db : contams) { cout << ""; }`, QueryFilter.cpp:179-182),
so the binary never matches anything and keeps every read.  This
framework's `filter` implements the documented semantics (classify vs
contaminant DBs, split kept/removed) and is pinned by its own tests.

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

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE) or shutil.which("g++") is None,
    reason="reference sources or C++ toolchain unavailable")

_COMP = {"A": "T", "T": "A", "C": "G", "G": "C"}


def _rc(s):
    return "".join(_COMP[c] for c in reversed(s))


# --- ORF-rich genome synthesis -------------------------------------------
# E. coli-like codon bias: per amino acid, one preferred codon at ~60%
# and the synonyms sharing the rest.  Gene lengths ~ 300-2100 nt, both
# strands, 20-200 nt intergenic spacers — enough real structure for
# Prodigal's single-genome training to build a sane gene model.
_AA_CODONS = {
    "A": ["GCG", "GCC", "GCA", "GCT"], "R": ["CGT", "CGC", "CGG", "AGA"],
    "N": ["AAC", "AAT"], "D": ["GAT", "GAC"], "C": ["TGC", "TGT"],
    "Q": ["CAG", "CAA"], "E": ["GAA", "GAG"], "G": ["GGC", "GGT", "GGG"],
    "H": ["CAT", "CAC"], "I": ["ATT", "ATC", "ATA"],
    "L": ["CTG", "TTA", "CTC", "TTG"], "K": ["AAA", "AAG"], "M": ["ATG"],
    "F": ["TTT", "TTC"], "P": ["CCG", "CCA", "CCT"],
    "S": ["AGC", "TCT", "TCC"], "T": ["ACC", "ACA", "ACT"],
    "W": ["TGG"], "Y": ["TAT", "TAC"], "V": ["GTG", "GTT", "GTC"],
}
_AAS = list(_AA_CODONS)
_STOPS = ["TAA", "TGA", "TAG"]


def _gene(rng, n_codons):
    aas = rng.choice(len(_AAS), size=n_codons)
    body = []
    for a in aas:
        codons = _AA_CODONS[_AAS[int(a)]]
        if len(codons) == 1 or rng.random() < 0.6:
            body.append(codons[0])
        else:
            body.append(codons[int(rng.integers(1, len(codons)))])
    return "ATG" + "".join(body) + _STOPS[int(rng.integers(0, 3))]


def orf_rich_genome(rng, length):
    parts, n = [], 0
    acgt = "ACGT"
    while n < length:
        ig = int(rng.integers(20, 200))
        parts.append("".join(acgt[int(i)]
                             for i in rng.integers(0, 4, size=ig)))
        g = _gene(rng, int(rng.integers(100, 700)))
        if rng.random() < 0.5:
            g = _rc(g)
        parts.append(g)
        n += ig + len(g)
    return "".join(parts)[:length]


def _mutate(seq, rate, rng):
    arr = np.frombuffer(seq.encode(), dtype=np.uint8).copy()
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    mut = rng.random(len(arr)) < rate
    arr[mut] = rng.choice(acgt, size=int(mut.sum()))
    return arr.tobytes().decode()


# --- shared environment ---------------------------------------------------

@pytest.fixture(scope="module")
def ref_binary():
    if not os.path.exists(BINARY):
        r = subprocess.run(["make", "-j8"], cwd=BUILD_DIR,
                           capture_output=True, timeout=1800)
        if r.returncode != 0:
            pytest.skip(f"reference binary build failed:\n"
                        f"{r.stderr.decode(errors='replace')[-2000:]}")
    return BINARY


def _write_taxdump(d, extra=()):
    d.mkdir(exist_ok=True)
    nodes = [(1, 1, "no rank"), (131567, 1, "no rank"),
             (2, 131567, "superkingdom"), (10, 2, "genus"),
             (100, 10, "species"), (200, 10, "species"),
             (300, 10, "species"),
             (101, 100, "strain"), (102, 100, "strain"),
             (201, 200, "strain"), (301, 300, "strain")] + list(extra)
    with open(d / "nodes.dmp", "w") as f:
        for t, p, r in nodes:
            f.write(f"{t}\t|\t{p}\t|\t{r}\t|\t\t|\t0\t|\t0\t|\t0\t|\t0\t|"
                    f"\t0\t|\t0\t|\t0\t|\t\t|\n")
    with open(d / "names.dmp", "w") as f:
        for t, _, _ in nodes:
            f.write(f"{t}\t|\tnode{t}\t|\t\t|\tscientific name\t|\n")
    (d / "merged.dmp").write_text("")


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    """Genomes + taxdump + read sets shared by every matrix cell."""
    rng = np.random.default_rng(20260821)
    tmp = tmp_path_factory.mktemp("golden_matrix")
    _write_taxdump(tmp / "taxdump")

    # three species in one genus; species 100 has two strains (one of
    # them a diverged mutant so LCA/redundancy paths get exercised)
    ga = orf_rich_genome(rng, 150_000)
    gb = _mutate(ga, 0.02, rng)              # strain of species 100
    gc = orf_rich_genome(rng, 130_000)       # species 200
    gd = orf_rich_genome(rng, 120_000)       # species 300
    genomes = {"GA": (ga, 101), "GB": (gb, 102),
               "GC": (gc, 201), "GD": (gd, 301)}
    for acc, (seq, _) in genomes.items():
        (tmp / f"{acc}.fna").write_text(f">{acc}\n{seq}\n")
    (tmp / "fastas.txt").write_text(
        "".join(f"{tmp}/{a}.fna\n" for a in genomes))
    with open(tmp / "acc2taxid.map", "w") as f:
        f.write("accession\taccession.version\ttaxid\tgi\n")
        for acc, (_, tid) in genomes.items():
            f.write(f"{acc}\t{acc}.1\t{tid}\t0\n")

    src = [(a, s) for a, (s, _) in genomes.items()]

    def sample(n, lo, hi, err=0.01, seed=1):
        r = np.random.default_rng(seed)
        out = []
        for i in range(n):
            acc, g = src[i % len(src)]
            ln = int(r.integers(lo, hi + 1))
            s = int(r.integers(0, len(g) - ln))
            seq = _mutate(g[s:s + ln], err, r)
            if r.random() < 0.5:
                seq = _rc(seq)
            out.append((f"{acc.lower()}_{i}", seq))
        return out

    # single/short reads (149-151 bp covers all L%3 classes)
    with open(tmp / "reads.fq", "w") as f:
        for name, seq in sample(240, 149, 151, seed=11):
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
        r = np.random.default_rng(12)
        for i in range(20):
            seq = "".join("ACGT"[int(j)] for j in r.integers(0, 4, 150))
            f.write(f"@rand{i}\n{seq}\n+\n{'I' * 150}\n")

    # paired reads: insert 280-420, mate2 = revcomp of downstream window
    r = np.random.default_rng(13)
    with open(tmp / "reads_1.fq", "w") as f1, \
            open(tmp / "reads_2.fq", "w") as f2:
        for i in range(200):
            acc, g = src[i % len(src)]
            ins = int(r.integers(280, 420))
            s = int(r.integers(0, len(g) - ins))
            frag = _mutate(g[s:s + ins], 0.01, r)
            m1, m2 = frag[:150], _rc(frag[-150:])
            f1.write(f"@p{i}\n{m1}\n+\n{'I' * 150}\n")
            f2.write(f"@p{i}\n{m2}\n+\n{'I' * 150}\n")

    # long reads (ONT-like): 2-20 kb at 5% error
    with open(tmp / "long.fq", "w") as f:
        for name, seq in sample(40, 2000, 20000, err=0.05, seed=14):
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")

    return tmp, genomes


def _ref_build(binary, tmp, db, *flags):
    db.mkdir(exist_ok=True)
    r = subprocess.run(
        [binary, "build", str(db), str(tmp / "fastas.txt"),
         str(tmp / "acc2taxid.map"), "--taxonomy-path",
         str(tmp / "taxdump"), *flags],
        capture_output=True, timeout=1800)
    assert r.returncode == 0, r.stdout.decode(errors="replace")[-2000:]
    return db


def _ref_classify(binary, db, out, job, reads, *flags):
    out.mkdir(exist_ok=True)
    r = subprocess.run(
        [binary, "classify", *[str(x) for x in reads], str(db), str(out),
         job, "--max-ram", "8", "--threads", "2", *flags],
        capture_output=True, timeout=1800)
    assert r.returncode == 0, r.stdout.decode(errors="replace")[-2000:]
    return out


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
                     taxcnt, c[4].strip())
    return ref


def _score_str_equal(score_f32, ref_str):
    """Strongest comparison the TSV allows (SURVEY.md:582-586): format
    our f32 score with the reference's own printed precision and require
    exact string equality — equal f32 bits always pass; a 1-ulp
    deviation only passes if it prints identically at that precision."""
    dec = len(ref_str.split(".")[1]) if "." in ref_str else 0
    return f"{float(np.float32(score_f32)):.{dec}f}" == ref_str


def _diff_results(results, tax, ref, check_cnt=True):
    """Per-read agreement: classified flag, taxid, covered length, score,
    rank, taxid:count sets."""
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
              and _score_str_equal(r.score, w[6])
              and (not w[0] or rank == w[4])
              and (not check_cnt or not w[0] or cnt == w[5]))
        if not ok:
            mismatches.append((qr.name, int(r.is_classified), cls,
                               qr.covered_length, float(r.score), rank,
                               cnt, w))
    assert not mismatches, \
        f"{len(mismatches)}/{len(ref)} reads disagree; " \
        f"first 3: {mismatches[:3]}"


def _my_classify(db, reads1, reads2=None, **over):
    from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams

    kw = dict(seq_mode=1, min_score=0.15, min_sp_score=0.5, batch_size=64)
    kw.update(over)
    params = ClassifyParams(**kw)
    clf = Classifier(str(db), params)
    results = clf.classify_file(str(reads1),
                                str(reads2) if reads2 else None)
    return results, clf


def _db_pairs(db_dir):
    """(metamer value, original-space taxid) pairs of a reference-format
    DB, canonically sorted — for k-mer-for-k-mer DB diffs."""
    from metabuli_work_tpu.index.format import load_reference_db

    db = load_reference_db(str(db_dir))
    orig = np.asarray([db.taxonomy.orig_of(t) for t in db.taxids],
                      dtype=np.uint64)
    pairs = np.stack([db.values.astype(np.uint64), orig], axis=1)
    return pairs[np.lexsort((pairs[:, 1], pairs[:, 0]))]


def _my_build(tmp, out_dir, **kw):
    from metabuli_work_tpu.index.builder import build_database

    args = dict(syncmer=False, mask_mode=0, orf_prediction=True,
                gene_predictor="prodigal")
    args.update(kw)
    return build_database(str(out_dir), str(tmp / "fastas.txt"),
                          str(tmp / "acc2taxid.map"), str(tmp / "taxdump"),
                          **args)


def _assert_db_equal(refdb_dir, mine, label):
    """mine: KmerIndex from build_database; diff vs reference DB dir."""
    ref_pairs = _db_pairs(refdb_dir)
    my_orig = np.asarray([mine.taxonomy.orig_of(t) for t in mine.taxids],
                         dtype=np.uint64)
    my_pairs = np.stack([mine.values.astype(np.uint64), my_orig], axis=1)
    my_pairs = my_pairs[np.lexsort((my_pairs[:, 1], my_pairs[:, 0]))]
    if ref_pairs.shape != my_pairs.shape \
            or not (ref_pairs == my_pairs).all():
        ref_set = set(map(tuple, ref_pairs))
        my_set = set(map(tuple, my_pairs))
        pytest.fail(f"{label}: DB k-mer sets differ "
                    f"(ref {ref_pairs.shape[0]} vs mine "
                    f"{my_pairs.shape[0]}); only-ref "
                    f"{list(ref_set - my_set)[:4]}; only-mine "
                    f"{list(my_set - ref_set)[:4]}")


# --- shared plain DB (mask 0, non-syncmer) --------------------------------

@pytest.fixture(scope="module")
def plain_db(ref_binary, env):
    tmp, _ = env
    return _ref_build(ref_binary, tmp, tmp / "DB_plain", "--mask", "0")


# =========================================================================
# Cell: paired-end (--seq-mode 2, the reference classify default)
# =========================================================================

def test_golden_paired_end(ref_binary, env, plain_db):
    tmp, _ = env
    out = _ref_classify(ref_binary, plain_db, tmp / "OUT_paired", "mx",
                        [tmp / "reads_1.fq", tmp / "reads_2.fq"],
                        "--seq-mode", "2", "--min-score", "0.15",
                        "--min-sp-score", "0.5")
    ref = _parse_ref_tsv(out / "mx_classifications.tsv")
    assert sum(v[0] for v in ref.values()) >= 150, \
        "reference should classify most paired reads"
    results, clf = _my_classify(plain_db, tmp / "reads_1.fq",
                                tmp / "reads_2.fq", seq_mode=2)
    _diff_results(results, clf.taxonomy, ref)


# =========================================================================
# Cell: syncmer DB (--syncmer 1) — DB contents AND classifications
# =========================================================================

@pytest.fixture(scope="module")
def syncmer_db(ref_binary, env):
    tmp, _ = env
    return _ref_build(ref_binary, tmp, tmp / "DB_sync", "--mask", "0",
                      "--syncmer", "1")


def test_golden_syncmer_db_contents(env, syncmer_db):
    tmp, _ = env
    mine = _my_build(tmp, tmp / "MYDB_sync", syncmer=True)
    _assert_db_equal(syncmer_db, mine, "syncmer build")


def test_golden_syncmer_classify(ref_binary, env, syncmer_db):
    tmp, _ = env
    out = _ref_classify(ref_binary, syncmer_db, tmp / "OUT_sync", "mx",
                        [tmp / "reads.fq"], "--seq-mode", "1",
                        "--min-score", "0.15", "--min-sp-score", "0.5")
    ref = _parse_ref_tsv(out / "mx_classifications.tsv")
    assert sum(v[0] for v in ref.values()) >= 180
    results, clf = _my_classify(syncmer_db, tmp / "reads.fq")
    _diff_results(results, clf.taxonomy, ref)


# =========================================================================
# Cell: masked build (--mask 1, the reference BUILD default) — proves
# native/tantan_mask.cpp == shim/tantan.cpp on DB contents, then
# classifications against the masked DB
# =========================================================================

@pytest.fixture(scope="module")
def masked_db(ref_binary, env):
    tmp, _ = env
    return _ref_build(ref_binary, tmp, tmp / "DB_mask",
                      "--mask", "1", "--mask-prob", "0.9")


def test_golden_masked_db_contents(env, masked_db):
    tmp, _ = env
    mine = _my_build(tmp, tmp / "MYDB_mask", mask_mode=1, mask_prob=0.9)
    _assert_db_equal(masked_db, mine, "masked build")


def test_golden_masked_classify(ref_binary, env, masked_db):
    tmp, _ = env
    out = _ref_classify(ref_binary, masked_db, tmp / "OUT_mask", "mx",
                        [tmp / "reads.fq"], "--seq-mode", "1",
                        "--min-score", "0.15", "--min-sp-score", "0.5")
    ref = _parse_ref_tsv(out / "mx_classifications.tsv")
    assert sum(v[0] for v in ref.values()) >= 150
    results, clf = _my_classify(masked_db, tmp / "reads.fq")
    _diff_results(results, clf.taxonomy, ref)


def test_golden_masked_queries(ref_binary, env, plain_db):
    """classify --mask 1: query-side tantan masking parity."""
    tmp, _ = env
    out = _ref_classify(ref_binary, plain_db, tmp / "OUT_qmask", "mx",
                        [tmp / "reads.fq"], "--seq-mode", "1",
                        "--min-score", "0.15", "--min-sp-score", "0.5",
                        "--mask", "1", "--mask-prob", "0.9")
    ref = _parse_ref_tsv(out / "mx_classifications.tsv")
    results, clf = _my_classify(plain_db, tmp / "reads.fq",
                                mask_mode=1, mask_prob=0.9)
    _diff_results(results, clf.taxonomy, ref)


# =========================================================================
# Cell: long reads (--seq-mode 3)
# =========================================================================

def test_golden_long_reads(ref_binary, env, plain_db):
    tmp, _ = env
    out = _ref_classify(ref_binary, plain_db, tmp / "OUT_long", "mx",
                        [tmp / "long.fq"], "--seq-mode", "3",
                        "--min-score", "0.008")
    ref = _parse_ref_tsv(out / "mx_classifications.tsv")
    assert sum(v[0] for v in ref.values()) >= 30
    results, clf = _my_classify(plain_db, tmp / "long.fq",
                                seq_mode=3, min_score=0.008,
                                min_sp_score=0.0, batch_size=8)
    _diff_results(results, clf.taxonomy, ref)


# =========================================================================
# Cell: EM (--em): mapping_results binary + EM reports + reclassify
# =========================================================================

def test_golden_em(ref_binary, env, plain_db):
    tmp, _ = env
    out = _ref_classify(ref_binary, plain_db, tmp / "OUT_em", "mx",
                        [tmp / "reads.fq"], "--seq-mode", "1",
                        "--min-score", "0.15", "--min-sp-score", "0.5",
                        "--em", "1")
    import struct

    def parse_mapping(path):
        """queryId -> multiset of (speciesId, score_f32)."""
        raw = open(path, "rb").read()
        out = {}
        for off in range(0, len(raw) - 11, 12):
            q, s, sc = struct.unpack_from("<iif", raw, off)
            out.setdefault(q, []).append((s, round(sc, 5)))
        return {q: sorted(v) for q, v in out.items()}

    results, clf = _my_classify(plain_db, tmp / "reads.fq", em=True)
    my_out = tmp / "MYOUT_em"
    my_out.mkdir(exist_ok=True)
    from metabuli_work_tpu.classify.em import run_em
    run_em(results, clf, str(my_out), "mx")

    ref_map = parse_mapping(out / "mx_mapping_results.txt")
    my_map = parse_mapping(my_out / "mx_mapping_results.txt")
    assert len(ref_map) > 100, "reference EM should map many reads"
    assert ref_map.keys() == my_map.keys(), \
        f"mapped query sets differ: {len(ref_map)} vs {len(my_map)}"
    bad = {q for q in ref_map if ref_map[q] != my_map[q]}
    assert not bad, (f"{len(bad)} queries' mapping rows differ; first: "
                     f"{[(q, ref_map[q], my_map[q]) for q in list(bad)[:2]]}")

    # EM report: per-taxon counts (integers after the reference's
    # rounding) must agree
    def parse_report(path):
        rows = {}
        for line in open(path):
            c = line.rstrip("\n").split("\t")
            if len(c) >= 5 and not line.startswith("#"):
                rows[c[4]] = (int(c[1]), int(c[2]))
        return rows

    ref_rows = parse_report(out / "mx_EM_report.tsv")
    my_rows = parse_report(my_out / "mx_EM_report.tsv")
    for key, (clade, taxon) in ref_rows.items():
        assert key in my_rows, f"taxid {key} missing from EM report"
        mc, mt = my_rows[key]
        assert abs(mc - clade) <= 1 and abs(mt - taxon) <= 1, \
            f"taxid {key}: EM clade/taxon {mc}/{mt} != ref {clade}/{taxon}"

    # reclassify: per-read final taxids must agree
    def parse_recls(path):
        rows = {}
        for line in open(path):
            if line.startswith("#"):
                continue
            c = line.rstrip("\n").split("\t")
            rows[c[1]] = (int(c[0]), int(c[2]))
        return rows

    ref_r = parse_recls(out / "mx_EM+reclassify_results.tsv")
    my_r = parse_recls(my_out / "mx_EM+reclassify_results.tsv")
    bad = [k for k in ref_r if ref_r[k] != my_r.get(k)]
    assert not bad, (f"{len(bad)} reclassified reads differ; first: "
                     f"{[(k, ref_r[k], my_r.get(k)) for k in bad[:3]]}")


# =========================================================================
# Cell: updateDB — incremental merge + new-taxa graft
# =========================================================================

def test_golden_update_db(ref_binary, env, tmp_path_factory):
    """Old DB = GA+GC; update adds GB (new strain of sp 100), GD, and a
    brand-new species 400/strain 401 grafted via --new-taxa.  The final
    DB must equal the reference's k-mer-for-k-mer."""
    tmp, genomes = env
    wd = tmp_path_factory.mktemp("upd")
    rng = np.random.default_rng(77)

    # old inputs: GA + GC only
    (wd / "old.txt").write_text(f"{tmp}/GA.fna\n{tmp}/GC.fna\n")
    olddb = wd / "OLD"
    olddb.mkdir()
    r = subprocess.run(
        [ref_binary, "build", str(olddb), str(wd / "old.txt"),
         str(tmp / "acc2taxid.map"), "--taxonomy-path",
         str(tmp / "taxdump"), "--mask", "0"],
        capture_output=True, timeout=1800)
    assert r.returncode == 0, r.stdout.decode(errors="replace")[-2000:]

    # new inputs: GB + GD + GE (new species 400, ORF-rich 110 kb)
    ge = orf_rich_genome(rng, 110_000)
    (wd / "GE.fna").write_text(f">GE\n{ge}\n")
    (wd / "new.txt").write_text(
        f"{tmp}/GB.fna\n{tmp}/GD.fna\n{wd}/GE.fna\n")
    with open(wd / "acc2taxid_new.map", "w") as f:
        f.write("accession\taccession.version\ttaxid\tgi\n"
                "GB\tGB.1\t102\t0\nGD\tGD.1\t301\t0\nGE\tGE.1\t401\t0\n")
    (wd / "new_taxa.tsv").write_text(
        "400\t10\tspecies\tnode400\n401\t400\tstrain\tnode401\n")

    refnew = wd / "REFNEW"
    refnew.mkdir()
    r = subprocess.run(
        [ref_binary, "updateDB", str(refnew), str(wd / "new.txt"),
         str(wd / "acc2taxid_new.map"), str(olddb),
         "--new-taxa", str(wd / "new_taxa.tsv"), "--mask", "0"],
        capture_output=True, timeout=1800)
    assert r.returncode == 0, r.stdout.decode(errors="replace")[-2000:]

    from metabuli_work_tpu.index.update import update_database

    mine = update_database(str(olddb), str(wd / "MYNEW"),
                           str(wd / "new.txt"),
                           str(wd / "acc2taxid_new.map"),
                           new_taxa_path=str(wd / "new_taxa.tsv"))
    _assert_db_equal(refnew, mine, "updateDB")


# =========================================================================
# Cell: accession-level (--accession-level 1) build + classify
# =========================================================================

@pytest.fixture(scope="module")
def acc_db(ref_binary, env):
    tmp, _ = env
    return _ref_build(ref_binary, tmp, tmp / "DB_acc", "--mask", "0",
                      "--accession-level", "1")


def test_golden_accession_classify(ref_binary, env, acc_db):
    tmp, _ = env
    out = _ref_classify(ref_binary, acc_db, tmp / "OUT_acc", "mx",
                        [tmp / "reads.fq"], "--seq-mode", "1",
                        "--min-score", "0.15", "--min-sp-score", "0.5",
                        "--accession-level", "1")
    ref = _parse_ref_tsv(out / "mx_classifications.tsv")
    assert sum(v[0] for v in ref.values()) >= 180
    results, clf = _my_classify(acc_db, tmp / "reads.fq",
                                accession_level=1)
    _diff_results(results, clf.taxonomy, ref)


# =========================================================================
# Cell: extract — reads classified under a clade
# =========================================================================

def test_golden_extract(ref_binary, env, plain_db, tmp_path_factory):
    tmp, _ = env
    out = _ref_classify(ref_binary, plain_db, tmp / "OUT_ex", "mx",
                        [tmp / "reads.fq"], "--seq-mode", "1",
                        "--min-score", "0.15", "--min-sp-score", "0.5")
    wd = tmp_path_factory.mktemp("extract")
    # reference extract writes <outdir>/<base>_<taxid>...
    r = subprocess.run(
        [ref_binary, "extract", str(tmp / "reads.fq"),
         str(out / "mx_classifications.tsv"), str(plain_db),
         "--tax-id", "100", "--seq-mode", "1",
         "--outdir", str(wd)],
        capture_output=True, timeout=600)
    assert r.returncode == 0, r.stdout.decode(errors="replace")[-1500:]
    ref_files = [p for p in os.listdir(wd) if p.startswith("reads_100")]
    assert ref_files, f"no reference extract output in {os.listdir(wd)}"

    def read_names(path):
        names = set()
        with open(path) as f:
            for line in f:
                if line.startswith(("@", ">")):
                    names.add(line[1:].split()[0])
        return names

    ref_names = read_names(str(wd / ref_files[0]))
    assert len(ref_names) > 50

    from metabuli_work_tpu.report.extract import extract_reads

    my_out = extract_reads(str(out / "mx_classifications.tsv"),
                           str(tmp / "reads.fq"), 100, str(plain_db))
    my_names = read_names(my_out if isinstance(my_out, str)
                          else str(tmp / "reads_100.fq"))
    assert my_names == ref_names, \
        (f"extract read sets differ: only-ref "
         f"{sorted(ref_names - my_names)[:5]}, only-mine "
         f"{sorted(my_names - ref_names)[:5]}")


# =========================================================================
# Cell: classifiedRefiner — min-score + taxid subtree filters
# =========================================================================

def test_golden_refiner(ref_binary, env, plain_db, tmp_path_factory):
    tmp, _ = env
    # --lineage 1: the reference refiner reads 8 fields unconditionally
    # (classifiedRefiner.cpp:46 parseFields fields[7])
    out = _ref_classify(ref_binary, plain_db, tmp / "OUT_rf", "mx",
                        [tmp / "reads.fq"], "--seq-mode", "1",
                        "--min-score", "0.15", "--min-sp-score", "0.5",
                        "--lineage", "1")
    # Two upstream quirks require input prep (both verified against the
    # source): (a) the output-existence check is inverted
    # (classifiedRefiner.cpp:109-112 returns 0 when the output does NOT
    # yet exist), so the output must be pre-created; (b) unclassified
    # rows hit taxonNode(0) during the lineage fill
    # (classifiedRefiner.cpp:323), a fatal lookup — so the refiner only
    # runs on classified-only input.
    src_tsv = out / "classified_only.tsv"
    with open(out / "mx_classifications.tsv") as fin, \
            open(src_tsv, "w") as fout:
        for line in fin:
            if line.startswith("#") or line.startswith("1\t"):
                fout.write(line)
    (out / "classified_only_refined.tsv").write_text("")
    r = subprocess.run(
        [ref_binary, "classifiedRefiner", str(src_tsv),
         str(tmp / "taxdump"),
         "--min-score", "0.5", "--select-taxid", "100"],
        capture_output=True, timeout=600)
    assert r.returncode == 0, r.stdout.decode(errors="replace")[-1500:]
    refined = [p for p in os.listdir(out)
               if p == "classified_only_refined.tsv"
               and os.path.getsize(out / p) > 0]
    assert refined, f"no refined output in {os.listdir(out)}"

    def parse_kept(path):
        kept = {}
        for line in open(path):
            if line.startswith("#"):
                continue
            c = line.rstrip("\n").split("\t")
            if len(c) >= 3:
                kept[c[1]] = int(c[2])
        return kept

    ref_kept = parse_kept(str(out / refined[0]))
    assert len(ref_kept) > 20

    from metabuli_work_tpu.report.refiner import refine

    my_path = str(tmp_path_factory.mktemp("rf") / "refined.tsv")
    refine(str(src_tsv), str(plain_db), my_path, min_score=0.5,
           include_taxids=[100])
    my_kept = parse_kept(my_path)
    assert my_kept == ref_kept, \
        (f"refiner outputs differ: ref {len(ref_kept)} rows vs mine "
         f"{len(my_kept)}; sym-diff "
         f"{sorted(set(ref_kept.items()) ^ set(my_kept.items()))[:5]}")


# =========================================================================
# Cell: Krona payload — the nested <node> XML of <job>_krona.html must
# carry the SAME hierarchy/counts as the binary's (Reporter.cpp:146-219).
# Trees are compared canonically (children as sorted multisets): the
# reference's child sort is unstable on clade-count ties, so sibling
# ORDER on equal counts is unspecified — the tree itself is not.
# =========================================================================

def _krona_tree(path):
    import xml.etree.ElementTree as ET

    h = open(path, encoding="utf-8", errors="replace").read()
    assert "<krona" in h and "</krona>" in h, f"no krona payload in {path}"
    xml = h[h.index("<krona"):h.index("</krona>") + len("</krona>")]
    root = ET.fromstring(xml).find("node")
    assert root is not None

    def canon(n):
        val = n.find("magnitude/val")
        kids = tuple(sorted(canon(c) for c in n.findall("node")))
        return (n.get("name"), int(val.text) if val is not None else 0,
                kids)

    return canon(root)


def test_golden_krona(ref_binary, env, plain_db, tmp_path_factory):
    tmp, _ = env
    out = _ref_classify(ref_binary, plain_db, tmp / "OUT_krona", "mx",
                        [tmp / "reads.fq"], "--seq-mode", "1",
                        "--min-score", "0.15", "--min-sp-score", "0.5")
    ref_tree = _krona_tree(out / "mx_krona.html")
    assert ref_tree[0] == "all" and ref_tree[1] > 0

    results, clf = _my_classify(plain_db, tmp / "reads.fq")
    my_out = tmp_path_factory.mktemp("krona")
    from metabuli_work_tpu.report import reporter

    reporter.write_all(str(my_out), "mx", results, clf.taxonomy)
    my_tree = _krona_tree(my_out / "mx_krona.html")
    assert my_tree == ref_tree
    # and the file must actually render: the embedded sunburst script
    # ships inside the same HTML (VERDICT r3: no blank pages)
    html = open(my_out / "mx_krona.html").read()
    assert "<script>" in html and "render(root)" in html
