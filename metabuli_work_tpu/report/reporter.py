"""Result writers: per-read TSV, Kraken-style report, Krona HTML.

Formats follow the reference Reporter (src/commons/Reporter.cpp:38-253;
column documentation README.md:195-235):

  <job>_classifications.tsv
    #is_classified name taxID query_length score rank [lineage] taxID:match_count
    (taxids printed in ORIGINAL id space; unclassified rows use '-')
  <job>_report.tsv
    clade_proportion clade_count taxon_count rank taxID name (2-space
    indent per depth); first row = unclassified; children sorted by
    descending clade count
  <job>_krona.html
    nested <node name=...><magnitude> XML (standalone HTML wrapper
    instead of the vendored krona prelude)
"""

import os
from typing import Dict, List

from ..classify.pipeline import QueryRecord
from ..taxonomy import Taxonomy


def _fmt_score(x: float) -> str:
    """C++ ostream default formatting for floats (6 significant digits)."""
    s = f"{x:.6g}"
    return s


def write_classifications(path, records: List[QueryRecord], taxonomy: Taxonomy,
                          print_lineage: bool = False, group_ids=None):
    with open(path, "w") as f:
        header = "#is_classified\tname\ttaxID\tquery_length\tscore\trank"
        if group_ids is not None:
            header += "\tgroup"
        if print_lineage:
            header += "\tlineage"
        header += "\ttaxID:match_count\n"
        f.write(header)
        for i, qr in enumerate(records):
            r = qr.result
            cls = 1 if r.is_classified else 0
            orig = taxonomy.orig_of(r.classification)
            cols = [str(cls), qr.name, str(orig), str(qr.covered_length), _fmt_score(r.score)]
            if r.is_classified:
                cols.append(taxonomy.rank_of(r.classification))
            else:
                cols.append("-")
            if group_ids is not None:
                g = group_ids[i]
                cols.append(str(g) if g else "-")
            if print_lineage:
                cols.append(_lineage(taxonomy, r.classification) if r.is_classified else "-")
            if r.is_classified:
                # classified rows end "taxid:cnt taxid:cnt \n"; unclassified
                # rows end "-\t\n" (reference Reporter.cpp:64-81)
                cnts = "".join(f"{taxonomy.orig_of(t)}:{c} " for t, c in sorted(r.tax_cnt.items()))
                f.write("\t".join(cols) + "\t" + cnts + "\n")
            else:
                f.write("\t".join(cols) + "\t-\t\n")


def _lineage(taxonomy: Taxonomy, taxid: int) -> str:
    chain = []
    node = int(taxid)
    while node > 1:
        chain.append(taxonomy.name_of(node))
        node = int(taxonomy.parent[node])
    return ";".join(reversed(chain))


def compute_clade_counts(tax_counts: Dict[int, int], taxonomy: Taxonomy):
    """taxid -> (taxon_count, clade_count, children list)."""
    clade: Dict[int, int] = {}
    taxon: Dict[int, int] = {}
    children: Dict[int, List[int]] = {}
    for t, c in tax_counts.items():
        if t <= 0:
            continue
        taxon[t] = taxon.get(t, 0) + c
        node = t
        while True:
            clade[node] = clade.get(node, 0) + c
            par = int(taxonomy.parent[node])
            if par == node:
                break
            if node not in children.setdefault(par, []):
                children[par].append(node)
            node = par
    return taxon, clade, children


def write_report(path, tax_counts: Dict[int, int], total_reads: int, taxonomy: Taxonomy):
    taxon, clade, children = compute_clade_counts(tax_counts, taxonomy)
    unclassified = tax_counts.get(0, 0)
    with open(path, "w") as f:
        f.write("#clade_proportion\tclade_count\ttaxon_count\trank\ttaxID\tname\n")
        if unclassified > 0:
            f.write(f"{100.0 * unclassified / max(total_reads, 1):.4f}\t{unclassified}\t{unclassified}\tno rank\t0\tunclassified\n")

        def emit(node, depth):
            cc = clade.get(node, 0)
            if cc == 0:
                return
            tc = taxon.get(node, 0)
            f.write(
                f"{100.0 * cc / max(total_reads, 1):.4f}\t{cc}\t{tc}\t"
                f"{taxonomy.rank_of(node)}\t{taxonomy.orig_of(node)}\t"
                f"{'  ' * depth}{taxonomy.name_of(node)}\n"
            )
            ch = sorted(children.get(node, []), key=lambda c: -clade.get(c, 0))
            for c in ch:
                emit(c, depth + 1)

        if clade:
            emit(taxonomy.root, 0)


_KRONA_HEADER = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Krona chart</title>
<style>body{font-family:sans-serif;background:#fff}</style></head>
<body><div style="display:none" id="krona"><krona>
"""


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace('"', "&quot;")


def write_krona(path, tax_counts: Dict[int, int], total_reads: int, taxonomy: Taxonomy):
    taxon, clade, children = compute_clade_counts(tax_counts, taxonomy)
    unclassified = tax_counts.get(0, 0)
    with open(path, "w") as f:
        f.write(_KRONA_HEADER)
        f.write(f'<node name="all"><magnitude><val>{total_reads}</val></magnitude>')
        if unclassified > 0:
            f.write(f'<node name="unclassified"><magnitude><val>{unclassified}</val></magnitude></node>')

        def emit(node):
            cc = clade.get(node, 0)
            if cc == 0:
                return
            f.write(f'<node name="{_escape(taxonomy.name_of(node))}"><magnitude><val>{cc}</val></magnitude>')
            for c in sorted(children.get(node, []), key=lambda c: -clade.get(c, 0)):
                emit(c)
            f.write("</node>")

        if clade:
            emit(taxonomy.root)
        f.write("</node></krona></div></body></html>")


def aggregate_tax_counts(records: List[QueryRecord]) -> Dict[int, int]:
    counts: Dict[int, int] = {}
    for qr in records:
        t = qr.result.classification if qr.result and qr.result.is_classified else 0
        counts[t] = counts.get(t, 0) + 1
    return counts


def write_all(out_dir, job_id, records, taxonomy, print_lineage=False):
    os.makedirs(out_dir, exist_ok=True)
    cls_path = os.path.join(out_dir, f"{job_id}_classifications.tsv")
    rpt_path = os.path.join(out_dir, f"{job_id}_report.tsv")
    krona_path = os.path.join(out_dir, f"{job_id}_krona.html")
    write_classifications(cls_path, records, taxonomy, print_lineage)
    counts = aggregate_tax_counts(records)
    write_report(rpt_path, counts, len(records), taxonomy)
    write_krona(krona_path, counts, len(records), taxonomy)
    return cls_path, rpt_path, krona_path
