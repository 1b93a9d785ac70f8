"""Match-kernel tests: probe + hamming filter vs a naive reference."""

import numpy as np

from metabuli_work_tpu.ops.genetic_code import HAMMING_TABLE

rng = np.random.default_rng(3)


def naive_hamming(q_dna, t_dna):
    total, per = 0, []
    for i in range(8):
        qi = (q_dna >> (3 * i)) & 7
        ti = (t_dna >> (3 * i)) & 7
        h = int(HAMMING_TABLE[(qi << 3) | ti])
        total += h
        per.append(h)
    return total, per  # per[i] = codon i counted from the low bits


def naive_match(q, frame, db_values, kmer_format=2):
    """All matches for one query kmer: (db_idx, hamming, rh) list."""
    q_aa = q >> 24
    cands = [(i, v) for i, v in enumerate(db_values) if (v >> 24) == q_aa]
    if not cands:
        return []
    hams = []
    for i, v in cands:
        h, per = naive_hamming(q & 0xFFFFFF, v & 0xFFFFFF)
        hams.append((i, h, per))
    min_h = min(h for _, h, _ in hams)
    cutoff = min(min_h * 2, 7)
    out = []
    use_fwd = not ((frame < 3) ^ (kmer_format == 2))
    for i, h, per in hams:
        if h <= cutoff:
            rh = 0
            for c in range(8):
                field = c if use_fwd else 7 - c
                rh |= (per[c] & 3) << (2 * field)
            out.append((i, h, rh))
    return out


def test_match_kernel_vs_naive():
    import jax.numpy as jnp

    from metabuli_work_tpu.ops.match_jax import match_kmers

    # small synthetic DB: a few AA runs with DNA variants
    aa_parts = rng.integers(0, 2**40, size=50, dtype=np.uint64)
    values = []
    for aa in aa_parts:
        for _ in range(int(rng.integers(1, 5))):
            values.append((aa << np.uint64(24)) | np.uint64(rng.integers(0, 2**24)))
    db = np.unique(np.array(values, dtype=np.uint64))
    taxids = rng.integers(1, 100, size=len(db)).astype(np.int32)
    species = rng.integers(1, 10, size=len(db)).astype(np.int32)

    # queries: half hit existing AA parts (with perturbed dna), half random
    qs = []
    for _ in range(40):
        if rng.random() < 0.7:
            base = db[rng.integers(0, len(db))]
            dna = np.uint64(rng.integers(0, 2**24)) if rng.random() < 0.5 else base & np.uint64(0xFFFFFF)
            qs.append((base & ~np.uint64(0xFFFFFF)) | dna)
        else:
            qs.append(np.uint64(rng.integers(0, 2**64, dtype=np.uint64)))
    q = np.array(qs, dtype=np.uint64)
    frames = rng.integers(0, 6, size=len(q)).astype(np.int32)
    valid = np.ones(len(q), dtype=bool)
    valid[::7] = False

    out = match_kmers(
        jnp.asarray(q), jnp.asarray(frames), jnp.asarray(valid),
        jnp.asarray(db), jnp.asarray(taxids), jnp.asarray(species),
        cap=16, kmer_format=2,
    )
    sel = np.asarray(out["sel"])
    ham = np.asarray(out["hamming"])
    rh = np.asarray(out["rh"])
    tax = np.asarray(out["taxid"])
    assert int(np.asarray(out["overflow"])) == 0

    for n in range(len(q)):
        got = [(int(tax[n, c]), int(ham[n, c]), int(rh[n, c])) for c in np.nonzero(sel[n])[0]]
        if not valid[n]:
            assert got == []
            continue
        want = [(int(taxids[i]), h, r) for i, h, r in naive_match(int(q[n]), int(frames[n]), db.tolist())]
        assert got == want, f"query {n}"


def test_match_overflow_reported():
    import jax.numpy as jnp

    from metabuli_work_tpu.ops.match_jax import match_kmers

    aa = np.uint64(12345)
    db = np.sort(np.array([(aa << np.uint64(24)) | np.uint64(d) for d in range(10)], dtype=np.uint64))
    taxids = np.arange(1, 11, dtype=np.int32)
    species = np.ones(10, dtype=np.int32)
    q = np.array([(aa << np.uint64(24)) | np.uint64(3)], dtype=np.uint64)
    out = match_kmers(
        jnp.asarray(q), jnp.zeros(1, jnp.int32), jnp.ones(1, bool),
        jnp.asarray(db), jnp.asarray(taxids), jnp.asarray(species),
        cap=4, kmer_format=2,
    )
    # overflow = #queries whose AA run exceeded cap (retry signal, not a
    # dropped-candidate count)
    assert int(np.asarray(out["overflow"])) == 1


def test_block_gather_equals_row_gather():
    """pack_db_blocks + _gather_blocks must reproduce the plain
    [cap+1, N] row gather exactly (incl. clamped tails and the sentinel
    padding past db_m)."""
    import jax.numpy as jnp

    from metabuli_work_tpu.ops import match_jax

    rng = np.random.default_rng(11)
    m, n = 3001, 257
    quad = rng.integers(0, 2**32, size=(m, 4), dtype=np.uint32)
    blk = match_jax.pack_db_blocks(quad)
    assert blk.shape[1] == 16
    for cap in (4, 8, 16):
        win = cap + 1
        lo = rng.integers(0, m + 1, size=n).astype(np.int32)  # incl. miss=m
        got = np.asarray(match_jax._gather_blocks(
            jnp.asarray(blk), jnp.asarray(lo), win))
        offs = np.arange(win)[:, None]
        pos = lo[None, :] + offs
        pad = np.full((win + 8, 4), 0xFFFFFFFF, dtype=np.uint32)
        quad_pad = np.concatenate([quad, pad])
        want = quad_pad[pos]
        assert got.shape == want.shape
        assert (got == want).all()
        # aligned mode: 4-aligned starts, exactly ceil(win/4) block rows
        lo4 = (rng.integers(0, m // 4, size=n) * 4).astype(np.int32)
        got4 = np.asarray(match_jax._gather_blocks(
            jnp.asarray(blk), jnp.asarray(lo4), cap, aligned=True))
        want4 = quad_pad[lo4[None, :] + np.arange(cap)[:, None]]
        assert got4.shape == want4.shape
        assert (got4 == want4).all()


def _mixed_run_db(rng, n_aa=60, max_run=16):
    """Sorted values with AA runs of mixed lengths (many > 4)."""
    aa_parts = np.sort(rng.integers(0, 2**40, size=n_aa, dtype=np.uint64))
    values = []
    for j, aa in enumerate(aa_parts):
        run = int(rng.integers(1, max_run + 1)) if j % 3 else \
            int(rng.integers(5, max_run + 1))   # force long runs
        dna = rng.choice(2**24, size=run, replace=False)
        for d in np.sort(dna):
            values.append((aa << np.uint64(24)) | np.uint64(d))
    return np.array(values, dtype=np.uint64)


def test_wide_rows_unaligned_equal_direct():
    """512-byte-row probe with UNALIGNED run starts (r5) must equal the
    plain direct-indexed probe on a DB with mixed AA-run lengths —
    covers every in-row offset 0..31 of the two-level window select."""
    import jax.numpy as jnp

    from metabuli_work_tpu.ops import match_jax

    rng = np.random.default_rng(23)
    values = _mixed_run_db(rng)
    m = len(values)
    ef = rng.integers(0, 1 << 20, size=m).astype(np.uint32)
    sp = rng.integers(1, 1 << 10, size=m).astype(np.uint32)
    quad = match_jax.pack_db_quad(values, ef, sp)
    wide = jnp.asarray(match_jax.pack_db_rows32(quad))
    ht, log2_rows, chain = match_jax.build_aa_hash(values, slots=42,
                                                   row_u32=128)
    ht = jnp.asarray(ht)

    # queries: mostly hits (perturbed dna), some misses
    qs = []
    for _ in range(300):
        if rng.random() < 0.8:
            base = values[rng.integers(0, m)]
            dna = np.uint64(rng.integers(0, 2**24)) if rng.random() < 0.5 \
                else base & np.uint64(0xFFFFFF)
            qs.append((base & ~np.uint64(0xFFFFFF)) | dna)
        else:
            qs.append(np.uint64(rng.integers(0, 2**64, dtype=np.uint64)))
    q = jnp.asarray(np.array(qs, dtype=np.uint64))
    frames = jnp.asarray(rng.integers(0, 6, size=300).astype(np.int32))
    valid = np.ones(300, dtype=bool)
    valid[::9] = False
    valid = jnp.asarray(valid)

    kw = dict(cap=16, kmer_format=2, hash_table=ht,
              hash_log2_rows=log2_rows, hash_chain=chain, db_m=m)
    got = match_jax.match_kmers_quad(q, frames, valid, wide, **kw)
    ref = match_jax.match_kmers_quad(q, frames, valid, jnp.asarray(quad),
                                     **kw)
    sel = np.asarray(ref["sel"])
    for k in ("sel", "hamming", "rh", "taxid", "species"):
        a, b = np.asarray(ref[k]), np.asarray(got[k])
        assert (a[sel] == b[sel]).all(), k
    assert (sel == np.asarray(got["sel"])).all()
    assert int(np.asarray(ref["overflow"])) == int(np.asarray(got["overflow"]))
