"""Streaming reference-DB import (VERDICT r2 item 6): converting a
reference-format DB must run in O(window) peak RAM, not O(DB) — the
reference's prebuilt DBs are 8-620 GiB (README.md:135-150) and its own
reader streams them (DeltaIdxReader.h:214-229).

Checks (a) windowed decode == one-shot decode for both on-disk layouts
(diffIdx/info and deltaIdx.mtbl), (b) a subprocess importing a ~23 MB
delta stream through a 1 MB window stays under a peak-RSS cap far below
the whole-stream cost, (c) the memmap cache is reused on reload."""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

rng = np.random.default_rng(55)


def _fake_values(n):
    """Sorted unique u64 metamers with realistic delta sizes."""
    gaps = rng.integers(1, 1 << 20, size=n, dtype=np.uint64)
    return np.cumsum(gaps, dtype=np.uint64)


def _write_ref_db(d, values, taxids):
    from metabuli_work_tpu.index.delta import encode_deltas

    os.makedirs(d, exist_ok=True)
    encode_deltas(values).astype("<u2").tofile(os.path.join(d, "diffIdx"))
    taxids.astype("<u4").tofile(os.path.join(d, "info"))


class _FlatTax:
    """Minimal taxonomy stub for the import (species_of only)."""

    def species_of(self, t):
        return np.asarray(t)


def test_windowed_import_equals_one_shot(tmp_path):
    from metabuli_work_tpu.index.delta import decode_deltas, encode_deltas
    from metabuli_work_tpu.index.format import import_reference_format

    n = 100_000
    values = _fake_values(n)
    taxids = rng.integers(1, 1000, size=n).astype(np.uint32)
    d = tmp_path / "REFDB"
    _write_ref_db(str(d), values, taxids)

    idx = import_reference_format(str(d), _FlatTax(),
                                  window_bytes=1 << 16)   # ~32k chunks
    assert np.array_equal(np.asarray(idx.values), values)
    assert np.array_equal(np.asarray(idx.taxids), taxids.astype(np.int32))

    # cache reuse: signature file present, second load maps the same data
    assert os.path.exists(d / ".import_cache" / "source.sig")
    idx2 = import_reference_format(str(d), _FlatTax())
    assert np.array_equal(np.asarray(idx2.values), values)


def test_windowed_mtbl_import_equals_one_shot(tmp_path):
    from metabuli_work_tpu.index.delta import (decode_metamer_deltas,
                                               encode_metamer_deltas)
    from metabuli_work_tpu.index.format import import_reference_format

    n = 20_000
    values = _fake_values(n)
    ids = rng.integers(1, (1 << 30) - 1, size=n).astype(np.uint64)
    chunks = encode_metamer_deltas(values, ids)
    d = tmp_path / "REFDB"
    os.makedirs(d)
    chunks.astype("<u2").tofile(os.path.join(d, "deltaIdx.mtbl"))

    idx = import_reference_format(str(d), _FlatTax(),
                                  window_bytes=1 << 14)
    assert np.array_equal(np.asarray(idx.values), values)
    assert np.array_equal(np.asarray(idx.taxids), ids.astype(np.int32))


_RSS_SCRIPT = r"""
import os, resource, sys
sys.path.insert(0, {repo!r})
import numpy as np
rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB
from metabuli_work_tpu.index.format import import_reference_format

class T:
    def species_of(self, t):
        return np.asarray(t)

idx = import_reference_format({db!r}, T(), window_bytes=1 << 20)
n = len(idx.values)
# touch a few entries (memmap pages), then report peak RSS growth
s = int(np.asarray(idx.values[:10]).sum()) + int(np.asarray(idx.values[n-10:]).sum())
rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
print(f"N={{n}} RSS_GROWTH_KB={{rss1 - rss0}}")
"""


def test_import_peak_rss_bounded(tmp_path):
    """4M entries (~23 MB of chunks, 64 MB of decoded arrays) imported
    through a 1 MB window: subprocess peak-RSS growth must stay well
    under the decoded-array total — proof the conversion itself is
    windowed (memmap writes don't count against RSS once evicted, and
    the window is 1 MB)."""
    n = 4_000_000
    values = _fake_values(n)
    taxids = rng.integers(1, 1000, size=n).astype(np.uint32)
    d = tmp_path / "REFDB"
    _write_ref_db(str(d), values, taxids)

    r = subprocess.run(
        [sys.executable, "-c",
         _RSS_SCRIPT.format(repo=REPO, db=str(d))],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-2000:]
    line = [ln for ln in r.stdout.splitlines() if "RSS_GROWTH" in ln][0]
    n_out = int(line.split("N=")[1].split()[0])
    growth_kb = int(line.split("RSS_GROWTH_KB=")[1])
    assert n_out == n
    # decoded arrays are 16 B/entry = 64 MB; numpy page-cache writes
    # through memmaps can transiently count, so cap at half the decoded
    # size — far below any whole-stream decode (which needs chunks +
    # diffs + cumsum temporaries, ~3x decoded size)
    assert growth_kb < 32 * 1024, \
        f"import peak RSS grew {growth_kb} KB (window is 1 MB)"
