"""Mode-composition matrix (VERDICT r2 item 2): the 3x2 matrix
{resident, DB-streaming, mesh} x {short reads, long reads > 64 kb} must
classify IDENTICALLY — no NotImplementedError cells.  The reference has
one code path for any DB size and any read length (RAM-bounded splits,
QueryIndexer.cpp:30-147); here the equivalents are the HBM-budget range
streaming and the (dp, db) mesh, and the long-read chunk path must
compose with both."""

import numpy as np
import pytest

from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams
from metabuli_work_tpu.index.builder import IndexBuilder
from tests.tests_helpers_tax import make_flat_tax

rng = np.random.default_rng(333)


@pytest.fixture(scope="module")
def setup():
    tax = make_flat_tax()
    g1 = "".join(rng.choice(list("ACGT"), 30000))
    g2 = "".join(rng.choice(list("ACGT"), 30000))
    builder = IndexBuilder(tax, syncmer=False, mask_mode=0)
    builder.add_sequence(g1, 3)
    builder.add_sequence(g2, 4)
    index = builder.finalize()

    comp = {"A": "T", "T": "A", "C": "G", "G": "C"}
    reads = []
    for i in range(24):
        g = g1 if i % 2 == 0 else g2
        s = int(rng.integers(0, len(g) - 151))
        seq = g[s:s + 150]
        if i % 3 == 0:
            seq = "".join(comp[c] for c in reversed(seq))
        reads.append((f"r{i}", seq))

    # >64k contig so classify_file must chunk it
    parts = []
    total = 0
    while total < 90_000:
        s = int(rng.integers(0, len(g1) - 4000))
        seg = g1[s:s + 4000]
        filler = "".join(rng.choice(list("ACGT"), 2000))
        parts.append(seg + filler)
        total += len(seg) + len(filler)
    contig = "".join(parts)[:90_001]
    return index, reads, contig


def _files(tmp_path_factory, reads, contig):
    tmp = tmp_path_factory.mktemp("modes")
    short = tmp / "short.fq"
    with open(short, "w") as f:
        for name, seq in reads:
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")
    longf = tmp / "long.fna"
    with open(longf, "w") as f:
        f.write(f">giant\n{contig}\n")
        f.write(f">mid\n{contig[:1500]}\n")
    return short, longf


def _collect(clf, path, seq_mode):
    results = clf.classify_file(str(path))
    out = {}
    for q in results:
        r = q.result
        out[q.name] = (bool(r.is_classified), int(r.classification),
                       float(np.float32(r.score)),
                       dict(getattr(r, "tax_cnt", None) or {}))
    return out


def _mk(index, seq_mode, mode):
    kw = dict(seq_mode=seq_mode, min_score=0.005, min_sp_score=0.005,
              batch_size=8)
    mesh = None
    if mode == "streaming":
        # force >= 4 range passes: quad bytes / (budget*0.5)
        quad_bytes = index.values.nbytes * 2
        kw["hbm_budget_gb"] = quad_bytes / (1 << 30) / 2
    elif mode in ("mesh", "mesh_stream"):
        import jax

        from metabuli_work_tpu.parallel.sharding import make_mesh

        mesh = make_mesh(min(4, len(jax.devices())))
        if mode == "mesh_stream":
            # budget small enough that the quad exceeds the 'db' axis
            # aggregate -> >= 2 range passes per batch
            quad_bytes = index.values.nbytes * 2
            n_db = mesh.shape["db"]
            kw["hbm_budget_gb"] = quad_bytes / (1 << 30) / n_db
    params = ClassifyParams(**kw)
    clf = Classifier.from_memory(index, params, mesh=mesh)
    if mode == "streaming":
        assert clf._streaming, "streaming mode must engage"
    if mode in ("mesh", "mesh_stream"):
        assert clf.mesh is not None
    if mode == "mesh_stream":
        assert clf._mesh_stream and clf._mesh_n_ranges >= 2, \
            "mesh x streaming must engage with >= 2 range passes"
    return clf


@pytest.mark.parametrize("mode",
                         ["resident", "streaming", "mesh", "mesh_stream"])
def test_short_reads_all_modes_equal(setup, tmp_path_factory, mode):
    index, reads, contig = setup
    short, _ = _files(tmp_path_factory, reads, contig)
    want = _collect(_mk(index, 1, "resident"), short, 1)
    assert sum(1 for v in want.values() if v[0]) >= 20
    if mode == "resident":
        return
    got = _collect(_mk(index, 1, mode), short, 1)
    assert got == want, {k: (got[k], want[k])
                         for k in want if got[k] != want[k]}


@pytest.mark.parametrize("mode", ["streaming", "mesh", "mesh_stream"])
def test_long_reads_compose_with_modes(setup, tmp_path_factory, mode):
    """The >64k contig classifies through the chunk path under mesh and
    streaming, equal to the resident chunk path (which test_long_chunk
    proves equal to an unchunked full-length row)."""
    index, reads, contig = setup
    _, longf = _files(tmp_path_factory, reads, contig)
    want = _collect(_mk(index, 3, "resident"), longf, 3)
    assert want["giant"][0], "resident long-read must classify"
    got = _collect(_mk(index, 3, mode), longf, 3)
    assert got == want, {k: (got[k], want[k])
                         for k in want if got[k] != want[k]}


@pytest.mark.parametrize("mode", ["streaming", "mesh", "mesh_stream"])
def test_wide_shards_all_modes_equal(setup, tmp_path_factory, mode):
    """512-byte-row (wide) shard layout in every sharded mode — the
    default production layout (unaligned run starts since r5, so no
    inflation guard gates it on toy DBs)."""
    index, reads, contig = setup
    short, _ = _files(tmp_path_factory, reads, contig)
    want = _collect(_mk(index, 1, "resident"), short, 1)
    clf = _mk(index, 1, mode)
    assert clf._shard_wide and clf._stream_quads.shape[-1] == 128
    got = _collect(clf, short, 1)
    assert got == want, {k: (got[k], want[k])
                         for k in want if got[k] != want[k]}
