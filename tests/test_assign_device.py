"""Device species-assign stage vs the host scoring flow (bit-identical)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from metabuli_work_tpu.classify.taxonomer import ReadResult
from metabuli_work_tpu.classify.taxonomer_vec import VectorTaxonomer
from metabuli_work_tpu.ops import assign_jax
from tests.tests_helpers_tax import make_flat_tax


def _random_paths(rng, B, n_paths, n_species, qlen=150, overlap=True):
    qid = rng.integers(1, B + 1, size=n_paths).astype(np.int64)
    species = rng.integers(3, 3 + n_species, size=n_paths).astype(np.int64)
    frame = rng.integers(0, 6, size=n_paths).astype(np.int64)
    start = rng.integers(0, qlen - 30, size=n_paths).astype(np.int64)
    ln = rng.integers(24, 60, size=n_paths).astype(np.int64)
    end = np.minimum(start + ln, qlen - 1)
    if not overlap:
        # spread paths of a run apart so no intervals intersect
        start = (np.arange(n_paths, dtype=np.int64) % 3) * 60
        end = start + 23
    depth = np.maximum((end - start) // 3, 1)
    score = (depth * 3).astype(np.float32) - rng.random(n_paths).astype(
        np.float32) * 8
    score = np.maximum(score, np.float32(0.5))
    ham = rng.integers(0, 12, size=n_paths).astype(np.int64)
    rhs = rng.integers(0, 1 << 16, size=n_paths).astype(np.int64)
    rhe = rng.integers(0, 1 << 16, size=n_paths).astype(np.int64)
    return {"qid": qid, "species": species, "frame": frame, "start": start,
            "end": end, "score": score, "hamming": ham,
            "rh_start": rhs, "rh_end": rhe}


def _host_flow(tax, p, qlens, B, min_score, tie_ratio):
    """Pipeline host ordering + score_paths, mirroring _finish_dp_phase1."""
    key = (((p["qid"] << 25) | p["species"]) << 19) \
        | (p["frame"] << 16) | p["end"]
    order = np.argsort(key, kind="stable")
    pa = {k: p[k][order] for k in
          ("qid", "species", "start", "end", "score", "hamming",
           "rh_start", "rh_end")}
    vt = VectorTaxonomer(tax, kmer_format=2, seq_mode=1,
                         min_score=min_score, tie_ratio=tie_ratio)
    results = [ReadResult() for _ in range(B)]
    deferred = vt.score_paths(pa, qlens, results)
    return results, deferred


def _device_flow(tax, p, qlens, B, min_score, tie_ratio, combine_k=16):
    """Pack into compact5 columns (in arbitrary order) + device_assign."""
    n = len(p["qid"])
    P = 1 << int(np.ceil(np.log2(max(n, 8))))
    g = (p["qid"] - 1) * 6 + p["frame"]
    cols = np.zeros((5, P), dtype=np.int32)
    cols[0, :n] = (g << 16) | p["start"]
    cols[1, :n] = (p["end"] << 16) | p["rh_start"]
    cols[2, :n] = (p["rh_end"] << 16) | p["hamming"]
    cols[3, :n] = p["species"]
    cols[4, :n] = p["score"].view(np.int32)
    depth, lift = tax.lca_lift_tables()
    rec, best_sp, over_k = jax.jit(
        assign_jax.device_assign,
        static_argnames=("min_score", "tie_ratio", "combine_k"))(
        jnp.asarray(cols), jnp.int32(n), jnp.asarray(qlens.astype(np.int32)),
        jnp.asarray(tax.euler_first.astype(np.int32)),
        jnp.asarray(tax.euler.astype(np.int32)),
        jnp.asarray(depth), jnp.asarray(lift),
        min_score=min_score, tie_ratio=tie_ratio, combine_k=combine_k)
    return np.asarray(rec), np.asarray(best_sp), int(over_k)


def _decode_records(rec, qlens, B, min_score):
    """pipeline._finish_full_phase1's record decode."""
    results = [ReadResult() for _ in range(B)]
    deferred = []
    live, tie = rec[0, 1:], rec[1, 1:]
    tot = rec[2, 1:].view(np.float32)
    lca, ft, top = rec[3, 1:], rec[4, 1:], rec[5, 1:]
    ms = float(min_score)
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
        deferred.append((int(i + 1), int(qlens[i + 1]), score, int(ft[i])))
    return results, deferred


@pytest.mark.parametrize("seed,n_species,min_score,overlap", [
    (0, 2, 0.15, True),    # heavy ties + trims
    (1, 8, 0.15, True),
    (2, 8, 0.0, True),     # min_score 0 keeps zero-score runs
    (3, 4, 0.15, False),   # disjoint runs (pure-sum fast path)
])
def test_device_assign_matches_host(seed, n_species, min_score, overlap):
    rng = np.random.default_rng(seed)
    B = 48
    tax = make_flat_tax(16)
    p = _random_paths(rng, B, 600, n_species, overlap=overlap)
    qlens = np.zeros(B + 1, dtype=np.int64)
    qlens[1:] = 150
    h_res, h_def = _host_flow(tax, p, qlens, B, min_score, 0.95)
    rec, best_sp, over_k = _device_flow(tax, p, qlens, B, min_score, 0.95)
    assert over_k == 0
    d_res, d_def = _decode_records(rec, qlens, B, min_score)

    assert [(r, q, s.view(np.int32) if hasattr(s, "view") else s, t)
            for r, q, s, t in h_def] == \
        [(r, q, s.view(np.int32) if hasattr(s, "view") else s, t)
         for r, q, s, t in d_def]
    for i in range(B):
        h, d = h_res[i], d_res[i]
        assert h.is_classified == d.is_classified, f"read {i}"
        assert h.classification == d.classification, f"read {i}"
        assert np.float32(h.score).view(np.int32) == \
            np.float32(d.score).view(np.int32), f"read {i}"
        assert h.top_species == d.top_species, f"read {i}"
    # best_sp mirrors the deferred list
    exp = np.zeros(B + 1, dtype=np.int32)
    for r, _, _, t in h_def:
        exp[r] = t
    assert np.array_equal(best_sp, exp)


def test_device_assign_combine_k_overflow():
    rng = np.random.default_rng(5)
    tax = make_flat_tax(4)
    B = 4
    # 12 paths in ONE (read, species) run with combine_k=8 -> overflow
    p = _random_paths(rng, 1, 12, 1)
    p["qid"][:] = 1
    p["species"][:] = 3
    qlens = np.zeros(B + 1, dtype=np.int64)
    qlens[1:] = 150
    _, _, over_k = _device_flow(tax, p, qlens, B, 0.15, 0.95, combine_k=8)
    assert over_k > 0
    rec, _, over_k2 = _device_flow(tax, p, qlens, B, 0.15, 0.95, combine_k=16)
    assert over_k2 == 0


def test_pipeline_with_device_assign(tmp_path, monkeypatch):
    """Full classify flow: device assign vs host scoring, identical
    classifications, scores and tax counts."""
    from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams
    from metabuli_work_tpu.index.builder import build_database

    rng = np.random.default_rng(11)
    genomes = ["".join(rng.choice(list("ACGT"), size=6000)) for _ in range(2)]
    d = tmp_path / "taxdump"
    d.mkdir()
    (d / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n2\t|\t1\t|\tgenus\t|\n"
        "3\t|\t2\t|\tspecies\t|\n4\t|\t2\t|\tspecies\t|\n")
    (d / "names.dmp").write_text("".join(
        f"{i}\t|\tn{i}\t|\t\t|\tscientific name\t|\n" for i in range(1, 5)))
    (d / "merged.dmp").write_text("")
    fasta = tmp_path / "g.fna"
    fasta.write_text(f">ACC_A\n{genomes[0]}\n>ACC_B\n{genomes[1]}\n")
    (tmp_path / "fastas.txt").write_text(str(fasta) + "\n")
    (tmp_path / "acc2taxid.map").write_text(
        "accession\taccession.version\ttaxid\tgi\n"
        "ACC_A\tACC_A.1\t3\t0\nACC_B\tACC_B.1\t4\t0\n")
    db = tmp_path / "db"
    build_database(str(db), str(tmp_path / "fastas.txt"),
                   str(tmp_path / "acc2taxid.map"), str(d), mask_mode=0)

    reads = tmp_path / "reads.fna"
    with open(reads, "w") as f:
        for i in range(24):
            gi = i % 2
            s = int(rng.integers(0, len(genomes[gi]) - 150))
            f.write(f">r{i}\n{genomes[gi][s:s + 150]}\n")
        # a couple of random (unclassifiable) reads
        for i in range(24, 28):
            f.write(f">r{i}\n{''.join(rng.choice(list('ACGT'), 150))}\n")

    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=28)

    def run(flag):
        monkeypatch.setenv("METABULI_DEVICE_ASSIGN", flag)
        clf = Classifier(str(db), params)
        res = clf.classify_file(str(reads))
        return [(q.result.is_classified, q.result.classification,
                 np.float32(q.result.score).view(np.int32),
                 dict(q.result.tax_cnt), q.result.top_species)
                for q in res]

    a, b = run("1"), run("0")
    assert a == b
