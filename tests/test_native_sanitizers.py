"""Sanitizer gate for the native host libraries (SURVEY 5.2).

The reference CI runs its regression suite under an ASan build
(azure-pipelines.yml:34-38); the equivalent here compiles the
framework's own native sources plus native/sancheck.cpp with
-fsanitize=address,undefined and runs every library's exercise, plus a
-fsanitize=thread run of the one multi-threaded library (tantan_mask's
chunk worker pool over a shared mask buffer).

Skipped when g++ lacks sanitizer runtimes.
"""

import gzip
import os
import shutil
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(REPO, "native")
PRODIGAL_REF = "/root/reference/lib/prodigal"
SHIM = os.path.join(REPO, "reference_build", "shim")

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


def _compile(tmp_path, sanitizer, with_prodigal):
    exe = str(tmp_path / f"sancheck_{sanitizer.split(',')[0]}")
    srcs = [os.path.join(NATIVE, s) for s in
            ("sancheck.cpp", "tantan_mask.cpp", "seqreader.cpp",
             "unionfind.cpp", "hostscore.cpp")]
    cmd = ["g++", "-O1", "-g", "-std=c++17", f"-fsanitize={sanitizer}",
           "-fno-omit-frame-pointer", "-pthread"]
    if with_prodigal:
        srcs.append(os.path.join(NATIVE, "prodigal_api.cpp"))
        srcs += [os.path.join(PRODIGAL_REF, f) for f in
                 os.listdir(PRODIGAL_REF)
                 if f.endswith(".cpp") and f != "training.cpp"]
        srcs.append(os.path.join(SHIM, "prodigal_training.cpp"))
        cmd += [f"-I{PRODIGAL_REF}", f"-I{SHIM}", "-w"]
    else:
        cmd += ["-DNO_PRODIGAL"]
    r = subprocess.run(cmd + srcs + ["-lz", "-o", exe],
                       capture_output=True, timeout=600)
    if r.returncode != 0:
        pytest.skip(f"sanitizer build unavailable: "
                    f"{r.stderr.decode(errors='replace')[-800:]}")
    return exe


def _run(exe, mode, *args):
    r = subprocess.run([exe, mode, *args], capture_output=True, timeout=600,
                       env={**os.environ, "ASAN_OPTIONS": "exitcode=99",
                            "TSAN_OPTIONS": "exitcode=99"})
    err = r.stderr.decode(errors="replace")
    assert r.returncode == 0, f"{mode}: rc={r.returncode}\n{err[-2000:]}"
    for marker in ("ERROR: AddressSanitizer", "WARNING: ThreadSanitizer",
                   "runtime error:"):
        assert marker not in err, f"{mode}: sanitizer report\n{err[-2000:]}"


@pytest.fixture(scope="module")
def fastq(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("san")
    rng = np.random.default_rng(3)
    path = tmp / "reads.fq.gz"
    with gzip.open(path, "wt") as f:
        for i in range(500):
            n = int(rng.integers(30, 400))
            seq = "".join(rng.choice(list("ACGTN"), n))
            f.write(f"@read{i} extra\n{seq}\n+\n{'I' * n}\n")
    return str(path)


def test_asan_ubsan_all_libs(tmp_path, fastq):
    with_prodigal = os.path.isdir(PRODIGAL_REF)
    exe = _compile(tmp_path, "address,undefined", with_prodigal)
    _run(exe, "tantan")
    _run(exe, "seqreader", fastq)
    _run(exe, "unionfind")
    _run(exe, "hostscore")
    if with_prodigal:
        _run(exe, "prodigal")


def test_tsan_threaded_tantan(tmp_path):
    exe = _compile(tmp_path, "thread", with_prodigal=False)
    _run(exe, "tantan")
