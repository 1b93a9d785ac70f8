"""Native C++ batch reader vs the Python reference reader."""

import gzip

import numpy as np
import pytest

from metabuli_work_tpu.io.fasta import read_seq_file

native = pytest.importorskip("metabuli_work_tpu.io.native_reader")
if not native.available():
    pytest.skip("no native toolchain", allow_module_level=True)


def write_fastq(path, n=300, gz=False):
    rng = np.random.default_rng(1)
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for i in range(n):
            L = int(rng.integers(50, 200))
            seq = "".join(rng.choice(list("ACGTN"), size=L))
            f.write(f"@read{i} some comment {i}\n{seq}\n+\n{'I' * L}\n")


def write_fasta(path, n=50):
    rng = np.random.default_rng(2)
    with open(path, "w") as f:
        for i in range(n):
            L = int(rng.integers(100, 5000))
            seq = "".join(rng.choice(list("ACGT"), size=L))
            # multi-line records
            f.write(f">seq{i} desc\n")
            for j in range(0, L, 70):
                f.write(seq[j:j + 70] + "\n")


@pytest.mark.parametrize("gz", [False, True])
def test_fastq_matches_python(tmp_path, gz):
    p = tmp_path / ("r.fastq" + (".gz" if gz else ""))
    write_fastq(p, n=300, gz=gz)
    want = list(read_seq_file(p))

    got_names, got_seqs = [], []
    for names, seqs, lens in native.NativeBatchReader(p, batch_size=64, max_len=256):
        for i, nm in enumerate(names):
            got_names.append(nm)
            got_seqs.append(bytes(seqs[i, :lens[i]]).decode())
    assert got_names == [w.name for w in want]
    assert got_seqs == [w.seq for w in want]


def test_fasta_matches_python(tmp_path):
    p = tmp_path / "g.fna"
    write_fasta(p)
    want = list(read_seq_file(p))
    got = []
    for names, seqs, lens in native.NativeBatchReader(p, batch_size=16, max_len=8192):
        for i, nm in enumerate(names):
            got.append((nm, bytes(seqs[i, :min(lens[i], 8192)]).decode(), int(lens[i])))
    assert [g[0] for g in got] == [w.name for w in want]
    assert [g[1] for g in got] == [w.seq for w in want]
    assert [g[2] for g in got] == [len(w.seq) for w in want]


def test_truncation_keeps_true_length(tmp_path):
    p = tmp_path / "t.fna"
    p.write_text(">long\n" + "A" * 500 + "\n")
    batches = list(native.NativeBatchReader(p, batch_size=4, max_len=100))
    names, seqs, lens = batches[0]
    assert lens[0] == 500                      # true length reported
    assert bytes(seqs[0]).decode() == "A" * 100  # row truncated
