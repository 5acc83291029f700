"""CLI: file and stdin/stdout modes, extension autodetection, ratio report
(analog of lz4_bin/src/main.rs behavior)."""

import subprocess
import sys

import pytest

from lz4_flex_tpu.cli import main


def test_file_roundtrip(tmp_path, corpus_34k):
    src = tmp_path / "data.txt"
    src.write_bytes(corpus_34k)
    assert main([str(src), "-f"]) == 0
    comp = tmp_path / "data.txt.lz4"
    assert comp.exists()
    src.unlink()
    assert main([str(comp), "-f"]) == 0  # .lz4 => decompress
    assert (tmp_path / "data.txt").read_bytes() == corpus_34k


def test_file_explicit_out_and_clean(tmp_path, corpus_1k):
    src = tmp_path / "in.bin"
    src.write_bytes(corpus_1k)
    out = tmp_path / "out.lz4"
    assert main([str(src), "-o", str(out), "--clean"]) == 0
    assert not src.exists()
    dec = tmp_path / "roundtrip.bin"
    assert main([str(out), "-d", "-o", str(dec)]) == 0
    assert dec.read_bytes() == corpus_1k


def test_decompress_needs_lz4_ext_or_out(tmp_path):
    src = tmp_path / "noext"
    src.write_bytes(b"x")
    assert main([str(src), "-d"]) == 1


def test_linked_mode_and_checksums(tmp_path, corpus_65k):
    src = tmp_path / "data.bin"
    src.write_bytes(corpus_65k * 4)
    out = tmp_path / "data.lz4"
    assert main([
        str(src), "-o", str(out), "--mode", "linked",
        "--block-size", "Max64KB", "--block-checksums", "--content-checksum",
    ]) == 0
    dec = tmp_path / "back.bin"
    assert main([str(out), "-d", "-o", str(dec)]) == 0
    assert dec.read_bytes() == corpus_65k * 4


def test_stdin_stdout_pipe(corpus_34k):
    comp = subprocess.run(
        [sys.executable, "-m", "lz4_flex_tpu.cli"],
        input=corpus_34k, capture_output=True, check=True,
    ).stdout
    assert len(comp) < len(corpus_34k)
    back = subprocess.run(
        [sys.executable, "-m", "lz4_flex_tpu.cli", "-d"],
        input=comp, capture_output=True, check=True,
    ).stdout
    assert back == corpus_34k


def test_legacy_flag(tmp_path, corpus_1k):
    src = tmp_path / "leg.bin"
    src.write_bytes(corpus_1k)
    out = tmp_path / "leg.lz4"
    assert main([str(src), "-o", str(out), "--legacy"]) == 0
    assert out.read_bytes()[:4] == bytes.fromhex("02214c18")
    dec = tmp_path / "leg.out"
    assert main([str(out), "-d", "-o", str(dec)]) == 0
    assert dec.read_bytes() == corpus_1k


def test_device_engine_roundtrip(tmp_path, corpus_34k):
    from lz4_flex_tpu import cli

    src = tmp_path / "d.txt"
    src.write_bytes(corpus_34k)
    assert cli.main([str(src), "-f", "--engine", "device"]) == 0
    out = tmp_path / "d.out"
    assert (
        cli.main([str(src) + ".lz4", "-f", "-o", str(out), "--engine", "device"]) == 0
    )
    assert out.read_bytes() == corpus_34k
    # cross-engine: host reads the device-written file
    out2 = tmp_path / "d2.out"
    assert cli.main([str(src) + ".lz4", "-f", "-o", str(out2)]) == 0
    assert out2.read_bytes() == corpus_34k
