"""Long-read mode (--seq-mode 3): whole-read processing + 1000-denominator."""

import numpy as np
import pytest

from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams
from metabuli_work_tpu.index.builder import build_database

rng = np.random.default_rng(31)


def rgen(n):
    return "".join(rng.choice(list("ACGT"), size=n))


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("longdb")
    d = tmp / "taxdump"
    d.mkdir()
    nodes = [(1, 1, "no rank"), (2, 1, "superkingdom"), (10, 2, "genus"),
             (11, 10, "species"), (111, 11, "strain")]
    with open(d / "nodes.dmp", "w") as f:
        for t, p, r in nodes:
            f.write(f"{t}\t|\t{p}\t|\t{r}\t|\n")
    with open(d / "names.dmp", "w") as f:
        for t, _, _ in nodes:
            f.write(f"{t}\t|\tn{t}\t|\t\t|\tscientific name\t|\n")
    (d / "merged.dmp").write_text("")
    genome = rgen(30000)
    fasta = tmp / "g.fna"
    fasta.write_text(f">G1\n{genome}\n")
    (tmp / "fl.txt").write_text(str(fasta) + "\n")
    (tmp / "a2t.map").write_text("accession\taccession.version\ttaxid\tgi\nG1\tG1.1\t111\t0\n")
    db_dir = tmp / "db"
    build_database(str(db_dir), str(tmp / "fl.txt"), str(tmp / "a2t.map"), str(d), mask_mode=0)
    return tmp, db_dir, genome


def mutate(seq, rate):
    arr = np.frombuffer(seq.encode(), dtype=np.uint8).copy()
    idx = np.nonzero(rng.random(len(arr)) < rate)[0]
    arr[idx] = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=len(idx))
    return arr.tobytes().decode()


def test_long_read_classification(db, tmp_path):
    tmp, db_dir, genome = db
    reads = tmp_path / "long.fq"
    with open(reads, "w") as f:
        for i in range(6):
            start = int(rng.integers(0, len(genome) - 8000))
            # ONT-like 5% error rate
            r = mutate(genome[start:start + 8000], 0.05)
            f.write(f"@long{i}\n{r}\n+\n{'I' * len(r)}\n")

    # ONT preset thresholds (README.md:185-189): min-score 0.008
    params = ClassifyParams(seq_mode=3, min_score=0.008, min_sp_score=0.0, batch_size=4)
    clf = Classifier(str(db_dir), params)
    assert clf.taxonomer.denominator == 1000  # long-read denominator
    res = clf.classify_file(str(reads))
    assert len(res) == 6
    ok = sum(1 for q in res if q.result.is_classified
             and clf.taxonomy.orig_of(clf.taxonomy.species_of(q.result.classification)) == 11)
    assert ok == 6
    assert all(q.total_length == 8000 for q in res)
