"""Tests for download/extraction helpers using a localhost HTTP server."""

import http.server
import os
import tarfile
import threading
import zipfile

import pytest

from timbre_trap_tpu.data.download import (change_base_dir,
                                           stream_url_resource,
                                           unzip_and_remove)


@pytest.fixture()
def http_root(tmp_path):
    root = tmp_path / "www"
    root.mkdir()
    (root / "payload.bin").write_bytes(os.urandom(70000))

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(
        *a, directory=str(root), **kw)
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield root, f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_stream_url_resource(http_root, tmp_path):
    root, base = http_root
    dest = str(tmp_path / "out.bin")
    stream_url_resource(f"{base}/payload.bin", dest)
    assert open(dest, "rb").read() == (root / "payload.bin").read_bytes()


def test_unzip_and_remove_zip(tmp_path):
    inner = tmp_path / "content.txt"
    inner.write_text("hello")
    zpath = str(tmp_path / "a.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.write(inner, "content.txt")
    inner.unlink()
    unzip_and_remove(zpath)
    assert not os.path.exists(zpath)
    assert (tmp_path / "content.txt").read_text() == "hello"


def test_unzip_and_remove_tar(tmp_path):
    inner = tmp_path / "content.txt"
    inner.write_text("hi")
    tpath = str(tmp_path / "a.tar.gz")
    with tarfile.open(tpath, "w:gz") as tf:
        tf.add(inner, "sub/content.txt")
    inner.unlink()
    unzip_and_remove(tpath, tar=True)
    assert not os.path.exists(tpath)
    assert (tmp_path / "sub" / "content.txt").read_text() == "hi"


def test_change_base_dir(tmp_path):
    old = tmp_path / "old"
    new = tmp_path / "new"
    old.mkdir(), new.mkdir()
    (old / "x.txt").write_text("x")
    (old / "sub").mkdir()
    change_base_dir(str(new), str(old))
    assert not old.exists()
    assert (new / "x.txt").read_text() == "x"
    assert (new / "sub").is_dir()
