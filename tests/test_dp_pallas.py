"""Pallas fused DP kernel vs the dp_jax XLA flow (bit-identical)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from metabuli_work_tpu.ops import dp_jax, dp_pallas  # noqa: E402

I32 = np.int32


def _random_case(rng, cap, G, W, n_species=5, density=0.4, dyn_gap=False):
    sel = rng.random((cap, G, W)) < density
    species = rng.integers(1, n_species + 1, size=(cap, G, W)).astype(I32)
    # sprinkle euk flags (bit 30)
    species = species | (rng.integers(0, 2, size=species.shape) << 30).astype(I32)
    dna = rng.integers(0, 1 << 24, size=(cap, G, W)).astype(I32)
    # bias toward consecutive chains in both directions: forward lanes
    # need next = (prev<<3)|new (isConsecutive2 fwd), reverse lanes the
    # mirrored form — make some windows satisfy each
    for w in range(1, W):
        m = rng.random((cap, G))
        new3 = rng.integers(0, 8, size=(cap, G))
        fwd_next = (((dna[:, :, w - 1] << 3) & 0xFFFFFF) | new3)
        rev_next = ((dna[:, :, w - 1] >> 3) | (new3 << 21))
        dna[:, :, w] = np.where(m < 0.35, fwd_next,
                                np.where(m < 0.7, rev_next,
                                         dna[:, :, w])).astype(I32)
    rh = rng.integers(0, 1 << 16, size=(cap, G, W)).astype(I32)
    ham = rng.integers(0, 8, size=(cap, G, W)).astype(I32)
    if dyn_gap:
        # compacted windows: strictly increasing positions with gaps
        gaps = rng.integers(1, 4, size=(G, W)).astype(I32)
        base = np.cumsum(gaps, axis=1) * 3
        pos = np.broadcast_to(base[None], (cap, G, W)).astype(I32)
    else:
        pos = np.broadcast_to(
            (np.arange(W, dtype=I32) * 3)[None, None, :], (cap, G, W)
        ).astype(I32).copy()
    return sel, species, dna, rh, ham, pos


def _reference(sel, species, dna, rh, ham, pos, min_cons, min_cons_euk,
               max_shift, kmer_format, dyn_gap, block_w, compact5):
    """dp_jax flow: sort -> path_dp -> pack_paths_blocked."""
    fields = {
        "sel": jnp.asarray(sel), "species": jnp.asarray(species),
        "dna": jnp.asarray(dna), "rh": jnp.asarray(rh),
        "ham": jnp.asarray(ham), "pos": jnp.asarray(pos),
    }
    fields = dp_jax.sort_candidates(fields, fields["sel"], fields["ham"],
                                    fields["dna"])
    md = jnp.where((fields["species"] >> 30) & 1 != 0,
                   jnp.int32(min_cons_euk), jnp.int32(min_cons))
    dp = dp_jax.path_dp(fields["sel"], fields["species"], fields["dna"],
                        fields["rh"], fields["ham"], fields["pos"], md,
                        max_shift=max_shift, kmer_format=kmer_format,
                        dyn_gap=dyn_gap)
    cols, psel, over = dp_jax.pack_paths_blocked(dp, block_w,
                                                 compact5=compact5)
    return np.asarray(cols), np.asarray(psel), int(over)


def _pallas(sel, species, dna, rh, ham, pos, min_cons, min_cons_euk,
            max_shift, kmer_format, dyn_gap, block_w, compact5):
    # the caller-side prep from flagship: flip reverse lanes, fold sel
    G = sel.shape[1]
    frame_ids = np.arange(G, dtype=I32) % 6
    rev_g = (frame_ids >= 3) if kmer_format != 1 else (frame_ids < 3)
    rev = rev_g[None, :, None]

    def flip(a):
        return np.where(rev, a[:, :, ::-1], a)

    sp_m = np.where(flip(sel), flip(species), -1).astype(I32)
    cols, valid, over = dp_pallas.path_dp_blocked(
        jnp.asarray(sp_m), jnp.asarray(flip(dna)), jnp.asarray(flip(rh)),
        jnp.asarray(flip(ham)), jnp.asarray(flip(pos)),
        min_cons=min_cons, min_cons_euk=min_cons_euk, max_shift=max_shift,
        kmer_format=kmer_format, dyn_gap=dyn_gap, block_w=block_w,
        compact5=compact5, interpret=True)
    return np.asarray(cols), np.asarray(valid), int(over)


def _canon(cols, valid, block_w, compact5):
    """Rows (per-lane ordered path tuples) for comparison."""
    C = cols.shape[0]
    cols = cols.reshape(C, block_w, -1)
    valid = valid.reshape(block_w, -1)
    out = []
    for g in range(cols.shape[2]):
        rows = [tuple(int(cols[c, s, g]) for c in range(C))
                for s in range(block_w) if valid[s, g]]
        out.append(rows)
    return out


@pytest.mark.parametrize("dyn_gap,max_shift,kmer_format", [
    (False, 1, 2),
    (False, 3, 2),
    (True, 3, 2),
    (False, 1, 1),
])
def test_pallas_matches_dp_jax(dyn_gap, max_shift, kmer_format):
    rng = np.random.default_rng(42 + max_shift + kmer_format)
    cap, G, W = 4, 12, 9
    block_w = 8
    case = _random_case(rng, cap, G, W, dyn_gap=dyn_gap)
    for compact5 in (True, False):
        ref = _reference(*case, 2, 3, max_shift, kmer_format, dyn_gap,
                         block_w, compact5)
        got = _pallas(*case, 2, 3, max_shift, kmer_format, dyn_gap,
                      block_w, compact5)
        assert ref[2] == got[2], "blk_over mismatch"
        r = _canon(ref[0], ref[1], block_w, compact5)
        p = _canon(got[0], got[1], block_w, compact5)
        assert r == p


def test_pallas_block_overflow_counts():
    rng = np.random.default_rng(7)
    cap, G, W = 4, 12, 12
    sel, species, dna, rh, ham, pos = _random_case(rng, cap, G, W,
                                                   n_species=2, density=0.95)
    # force exact 2-chains everywhere (both directions so every lane
    # emits): depth-2 paths emit at min_cons == 2 and flood block_w=2
    dna = rng.integers(0, 1 << 24, size=(cap, G, W)).astype(I32)
    for w in range(1, W, 2):
        new3 = rng.integers(0, 8, size=(cap, G))
        fwd_next = (((dna[:, :, w - 1] << 3) & 0xFFFFFF) | new3)
        rev_next = ((dna[:, :, w - 1] >> 3) | (new3 << 21))
        fwd_lane = (np.arange(G, dtype=I32) % 6 < 3)[None, :]
        dna[:, :, w] = np.where(fwd_lane, fwd_next, rev_next).astype(I32)
    case = (sel, species, dna, rh, ham, pos)
    ref = _reference(*case, 2, 2, 1, 2, False, 2, True)
    got = _pallas(*case, 2, 2, 1, 2, False, 2, True)
    assert ref[2] == got[2]
    assert ref[2] > 0  # the case must actually overflow to be meaningful


def test_pallas_empty():
    cap, G, W = 4, 12, 6
    z = np.zeros((cap, G, W), dtype=I32)
    sel = np.zeros((cap, G, W), dtype=bool)
    got = _pallas(sel, z, z, z, z, z, 2, 3, 1, 2, False, 4, True)
    assert got[2] == 0
    assert not got[1].any()


def test_pipeline_with_pallas_dp(tmp_path, monkeypatch):
    """Full classify flow with the Pallas DP kernel (interpret on CPU)
    produces identical classifications to the XLA flow."""
    from metabuli_work_tpu.classify.pipeline import Classifier, ClassifyParams
    from metabuli_work_tpu.index.builder import build_database

    rng = np.random.default_rng(3)
    genome = "".join(rng.choice(list("ACGT"), size=4000))
    d = tmp_path / "taxdump"
    d.mkdir()
    (d / "nodes.dmp").write_text(
        "1\t|\t1\t|\tno rank\t|\n2\t|\t1\t|\tgenus\t|\n"
        "3\t|\t2\t|\tspecies\t|\n")
    (d / "names.dmp").write_text(
        "1\t|\troot\t|\t\t|\tscientific name\t|\n"
        "2\t|\tG\t|\t\t|\tscientific name\t|\n"
        "3\t|\tSp\t|\t\t|\tscientific name\t|\n")
    (d / "merged.dmp").write_text("")
    fasta = tmp_path / "g.fna"
    fasta.write_text(f">ACC_X\n{genome}\n")
    (tmp_path / "fastas.txt").write_text(str(fasta) + "\n")
    (tmp_path / "acc2taxid.map").write_text(
        "accession\taccession.version\ttaxid\tgi\n"
        "ACC_X\tACC_X.1\t3\t0\n")
    db = tmp_path / "db"
    build_database(str(db), str(tmp_path / "fastas.txt"),
                   str(tmp_path / "acc2taxid.map"), str(d), mask_mode=0)

    reads = tmp_path / "reads.fna"
    with open(reads, "w") as f:
        for i in range(8):
            s = int(rng.integers(0, len(genome) - 150))
            f.write(f">r{i}\n{genome[s:s + 150]}\n")

    params = ClassifyParams(seq_mode=1, min_score=0.15, min_sp_score=0.5,
                            batch_size=8)

    def run(flag):
        monkeypatch.setenv("METABULI_DP_PALLAS", flag)
        clf = Classifier(str(db), params)
        res = clf.classify_file(str(reads))
        return [(q.result.is_classified, q.result.classification,
                 round(float(q.result.score), 6)) for q in res]

    assert run("1") == run("0")
