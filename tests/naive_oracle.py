"""Naive per-window scalar implementations used only as test oracles.

Deliberately written as direct simulations of the documented semantics
(not shared with the library's vectorized code paths) so tests compare
two independent derivations.
"""

COMP = {"A": "T", "T": "A", "C": "G", "G": "C"}

# genetic code via plain codon string table
CODON_TABLE = {}
for aa_id, codons in {
    0: ["GCA", "GCC", "GCT", "GCG"],
    1: ["CGA", "CGC", "CGT", "CGG", "AGG", "AGA"],
    2: ["AAC", "AAT"],
    3: ["GAC", "GAT"],
    4: ["TGC", "TGT"],
    5: ["CAA", "CAG"],
    6: ["GAA", "GAG"],
    7: ["GGA", "GGC", "GGT", "GGG"],
    8: ["CAC", "CAT"],
    9: ["ATA", "ATC", "ATT"],
    10: ["CTA", "CTC", "CTT", "CTG", "TTG", "TTA"],
    11: ["AAA", "AAG"],
    12: ["ATG"],
    13: ["TTC", "TTT"],
    14: ["CCA", "CCC", "CCT", "CCG"],
    15: ["TCA", "TCC", "TCT", "TCG", "AGT", "AGC"],
    16: ["ACA", "ACC", "ACT", "ACG"],
    17: ["TGG"],
    18: ["TAC", "TAT"],
    19: ["GTA", "GTC", "GTT", "GTG"],
    20: ["TAA", "TAG", "TGA"],
}.items():
    for c in codons:
        CODON_TABLE[c] = aa_id

ORD_FIXUPS = {"AGG": 4, "AGA": 5, "TTG": 4, "TTA": 5, "AGT": 6, "AGC": 7, "TGA": 5}
THIRD = {"A": 0, "C": 1, "T": 2, "G": 3}


def codon_info(c3: str):
    """(aa, ordinal) or None if codon contains a non-ACGT char."""
    c3 = c3.upper()
    if c3 not in CODON_TABLE:
        return None
    return CODON_TABLE[c3], ORD_FIXUPS.get(c3, THIRD[c3[2]])


def revcomp(s: str) -> str:
    return "".join(COMP.get(ch.upper(), "N") for ch in reversed(s))


def max_covered(L: int) -> int:
    return L - {0: 3, 1: 4, 2: 2}[L % 3]


def naive_frame_kmers(seq: str, begin: int, used_len: int, forward: bool):
    """Emit (metamer, pos) per valid window of one frame."""
    k = 8
    aa_len = used_len // 3
    seq_end = begin + used_len - 1
    out = []
    for w in range(aa_len - k + 1):
        aa_part = 0
        dna_part = 0
        ok = True
        for j in range(k):
            if forward:
                ci = begin + (w + j) * 3
                c3 = seq[ci:ci + 3]
            else:
                ci = seq_end - (w + j) * 3
                c3 = revcomp(seq[ci - 2:ci + 1])
            info = codon_info(c3)
            if info is None:
                ok = False
                break
            aa_part = (aa_part << 5) | info[0]
            dna_part = (dna_part << 3) | info[1]
        if not ok:
            continue
        val = ((aa_part << 24) | (dna_part & 0xFFFFFF)) & 0xFFFFFFFFFFFFFFFF
        pos = begin + 3 * w if forward else seq_end - 3 * (w + k) + 1
        out.append((val, pos))
    return out


def naive_six_frames(seq: str):
    L = len(seq)
    used = max_covered(L)
    out = []
    if used < 24:
        return out
    for frame in range(6):
        fwd = frame < 3
        begin = frame % 3 if fwd else (L % 3 - frame % 3) % 3
        for val, pos in naive_frame_kmers(seq, begin, used, fwd):
            out.append((val, pos, frame))
    return out


def naive_syncmer_keep(aa_seq_ids, k=8, s=5):
    """Given the AA ids of one frame, which window indices pass the
    open-syncmer anchor rule (leftmost-min s-mer at offset 0 or k-s)."""
    n = len(aa_seq_ids)
    smers = []
    for i in range(n - s + 1):
        v = 0
        for j in range(s):
            v = (v << 5) | aa_seq_ids[i + j]
        smers.append(v)
    keep = []
    for w in range(n - k + 1):
        window = smers[w : w + k - s + 1]
        mn = min(window)
        arg = window.index(mn)
        keep.append(arg in (0, k - s))
    return keep
