"""`databases` command: listing, resumable download, extract, degrade.

The reference analogue is data/metabulidatabases.sh (curl -C -/wget
--continue + tar zxvf).  Network is exercised against a local
http.server so the test runs in egress-less environments.
"""

import io
import os
import tarfile
import threading

import numpy as np
import pytest

from metabuli_work_tpu import cli


class _Args:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def test_databases_listing(capsys):
    assert cli.cmd_databases(_Args(name=None, outdir=".", tmp=None)) == 0
    out = capsys.readouterr().out
    assert "GTDB" in out and "RefSeq_virus" in out


def test_databases_unknown():
    assert cli.cmd_databases(_Args(name="nope", outdir=".", tmp=None)) == 1


def test_databases_no_egress(tmp_path, capsys, monkeypatch):
    """Unreachable host -> graceful instructions, rc 1, no partial tar."""
    def boom(url, dest, timeout=30):
        raise OSError("no route to host")

    monkeypatch.setattr(cli, "_download_resumable", boom)
    rc = cli.cmd_databases(_Args(name="RefSeq_virus",
                                 outdir=str(tmp_path / "db"),
                                 tmp=str(tmp_path / "tmp")))
    assert rc == 1
    out = capsys.readouterr().out
    assert "Download failed" in out and "refseq_virus.tar.gz" in out


@pytest.fixture
def http_archive(tmp_path):
    """Local HTTP server with Range support serving a small DB tarball."""
    import http.server

    serve_dir = tmp_path / "serve"
    serve_dir.mkdir()
    payload = tmp_path / "payload"
    payload.mkdir()
    rng = np.random.default_rng(0)
    (payload / "diffIdx").write_bytes(rng.integers(
        0, 255, size=200_000, dtype=np.uint8).tobytes())
    (payload / "db.parameters").write_text("Syncmer\t0\n")
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        tf.add(payload / "diffIdx", arcname="diffIdx")
        tf.add(payload / "db.parameters", arcname="db.parameters")
    (serve_dir / "refseq_virus.tar.gz").write_bytes(buf.getvalue())

    handler = type("H", (http.server.SimpleHTTPRequestHandler,), {
        "directory": str(serve_dir),
        "log_message": lambda *a, **k: None,
        "protocol_version": "HTTP/1.1",
    })

    def make(*a, **kw):
        return handler(*a, directory=str(serve_dir), **kw)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), make)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", buf.getvalue()
    srv.shutdown()


def test_download_extract(tmp_path, http_archive, monkeypatch, capsys):
    base, blob = http_archive
    # point the command at the local server
    src = cli.cmd_databases.__globals__
    real_dl = cli._download_resumable

    def dl(url, dest, timeout=30):
        return real_dl(url.replace(
            "https://metabuli.steineggerlab.workers.dev", base), dest,
            timeout=timeout)

    monkeypatch.setattr(cli, "_download_resumable", dl)
    out_dir = tmp_path / "out"
    rc = cli.cmd_databases(_Args(name="RefSeq_virus", outdir=str(out_dir),
                                 tmp=str(tmp_path / "tmp")))
    assert rc == 0
    assert (out_dir / "diffIdx").exists()
    assert (out_dir / "db.parameters").read_text() == "Syncmer\t0\n"
    assert not (tmp_path / "tmp" / "refseq_virus.tar.gz.part").exists()


def test_download_resume(tmp_path, http_archive):
    """A truncated .part file resumes from its offset (Range request)."""
    base, blob = http_archive
    dest = tmp_path / "a.tar.gz"
    half = len(blob) // 2
    (tmp_path / "a.tar.gz.part").write_bytes(blob[:half])
    cli._download_resumable(f"{base}/refseq_virus.tar.gz", str(dest))
    assert dest.read_bytes() == blob
