"""grep CLI tests (examples/grep.rs analogue: backend-string dispatch,
invalid backend is an error)."""

import pytest

from sliceslice_tpu.cli import main, search_in_file


@pytest.fixture()
def corpus_file(tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_bytes(b"lorem ipsum dolor sit amet " * 100)
    return str(p)


@pytest.mark.parametrize("backend", ["dynamic", "pallas", "xla", "naive"])
def test_cli_backends(backend, corpus_file, capsys):
    assert main([backend, "ipsum", corpus_file]) == 0
    assert "match at 6" in capsys.readouterr().out
    assert main([backend, "zebra", corpus_file]) == 1


def test_cli_memchr(corpus_file, capsys):
    assert main(["memchr", "d", corpus_file]) == 0
    assert "match at 12" in capsys.readouterr().out


def test_cli_batched(corpus_file, capsys):
    assert main(["batched", "ipsum,zebra,amet", corpus_file]) == 0
    out = capsys.readouterr().out
    assert "ipsum: match at 6" in out
    assert "zebra: no match" in out


def test_cli_stream(tmp_path, capsys):
    import numpy as np

    rng = np.random.default_rng(5)
    data = bytes(rng.integers(97, 110, (300_000,), dtype=np.uint8))
    p = tmp_path / "big.bin"
    p.write_bytes(data)
    nd = data[123_456:123_468].decode("latin-1")
    from sliceslice_tpu.utils import streaming

    old = streaming.StreamingScanner.__init__
    # Small windows so the file actually streams in multiple windows.
    def patched(self, needles, window_bytes=100_000, check_every=4):
        old(self, needles, window_bytes, check_every)
    streaming.StreamingScanner.__init__ = patched
    try:
        assert main(["stream", f"{nd},zebra!", str(p)]) == 0
        out = capsys.readouterr().out
        assert f"{nd}: match at 123456" in out
        assert "zebra!: no match" in out
        assert main(["stream-count", f"{nd},zebra!", str(p)]) == 0
        out = capsys.readouterr().out
        assert f"{nd}: 1" in out and "zebra!: 0" in out
        assert main(["stream-positions", f"{nd},zebra!", str(p)]) == 0
        out = capsys.readouterr().out
        assert f"{nd}: 123456" in out and "zebra!: no match" in out
    finally:
        streaming.StreamingScanner.__init__ = old


def test_cli_invalid_backend(corpus_file):
    # reference: panics on invalid backend (examples/grep.rs:39)
    with pytest.raises(SystemExit):
        search_in_file("avx512", b"x", corpus_file)


def test_cli_usage():
    assert main([]) == 2


def test_cli_count(corpus_file, capsys):
    assert main(["count", "ipsum,zebra,or", corpus_file]) == 0
    out = capsys.readouterr().out
    assert "ipsum: 100" in out
    assert "zebra: 0" in out
    assert "or: 200" in out  # "lorem" + "dolor" per repeat


def test_cli_positions(corpus_file, capsys):
    assert main(["positions", "ipsum,zebra", corpus_file]) == 0
    out = capsys.readouterr().out
    # "ipsum" occurs at 6, 33, 60, ... (every 27 bytes)
    assert "ipsum: 6,33,60" in out
    assert "(+0 more)" not in out
    assert "zebra: no match" in out
    # 300 occurrences: only the first 100 print, the rest elided
    assert main(["positions", "m", corpus_file]) == 0
    out = capsys.readouterr().out
    assert "(+200 more)" in out  # 3 'm's per 27-byte repeat


def test_split_needles_escaping():
    from sliceslice_tpu.cli import split_needles

    assert split_needles(b"a,b,c") == [b"a", b"b", b"c"]
    # \, is a literal comma inside a needle (plain split was silently wrong)
    assert split_needles(rb"a\,b,c") == [b"a,b", b"c"]
    assert split_needles(rb"a\\,b") == [b"a\\", b"b"]
    assert split_needles(rb"a\\\,b") == [b"a\\,b"]
    assert split_needles(b"") == [b""]
    assert split_needles(b"a,") == [b"a", b""]
    # a lone backslash before a non-escapable byte passes through verbatim
    assert split_needles(rb"a\nb") == [rb"a\nb"]


def test_cli_count_escaped_comma(tmp_path, capsys):
    p = tmp_path / "hay.txt"
    p.write_bytes(b"x,y and x and y," * 10)
    assert main(["count", r"x\,y,y\,", str(p)]) == 0
    out = capsys.readouterr().out
    assert "x,y: 10" in out
    assert "y,: 10" in out  # "y," once per 16-byte repeat


def test_cli_multiple_files_reuse_searcher(tmp_path, capsys):
    """One searcher serves every file argument (probe tables and jit
    programs amortize — the CLI's preprocess-once contract)."""
    p1 = tmp_path / "a.txt"
    p2 = tmp_path / "b.txt"
    p1.write_bytes(b"xxipsumyy" * 500)
    p2.write_bytes(b"nothing here" * 500)
    assert main(["batched", "ipsum,zz", str(p1), str(p2)]) == 0
    out = capsys.readouterr().out
    assert f"{p1}: ipsum: match at 2" in out
    assert f"{p2}: ipsum: no match" in out


def test_cli_sharded_backends(tmp_path, capsys):
    """The L5 distributed scanner behind the grep workflow (reference grep
    reaches every backend by string, examples/grep.rs:12-40): find/count/
    positions over the virtual device mesh, with an explicit --mesh shape."""
    import jax

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs the 8-device virtual mesh")
    rng = __import__("numpy").random.default_rng(11)
    corpus = bytes(rng.integers(97, 110, (300_000,), dtype="uint8"))
    p = tmp_path / "hay.bin"
    p.write_bytes(corpus)
    nd = corpus[123_456:123_468].decode()
    assert main(["--mesh", "4x2", "sharded", nd + ",zzqqy", str(p)]) == 0
    out = capsys.readouterr().out
    assert f"{nd}: match at 123456" in out
    assert "zzqqy: no match" in out
    assert main([f"--mesh=2x4", "sharded-count", nd, str(p)]) == 0
    out = capsys.readouterr().out
    assert f"{nd}: 1" in out
    assert main(["sharded-positions", nd, str(p)]) == 0  # default mesh
    out = capsys.readouterr().out
    assert f"{nd}: 123456" in out


def test_cli_sharded_bad_mesh(tmp_path):
    p = tmp_path / "h.txt"
    p.write_bytes(b"abc" * 100)
    import pytest

    with pytest.raises(SystemExit, match="invalid mesh"):
        main(["--mesh", "nope", "sharded", "abc", str(p)])


def test_cli_mesh_flag_edge_cases(tmp_path, capsys):
    """--mesh parses only as the exact flag: an unknown --meshes flag is
    NOT silently consumed (it lands in the backend slot and errors), and a
    trailing bare --mesh yields the usage message instead of an
    IndexError (ADVICE r4)."""
    import pytest

    p = tmp_path / "h.txt"
    p.write_bytes(b"hello world")
    with pytest.raises(SystemExit, match="unknown backend"):
        main(["--meshes", "2x4", "dynamic", "hello", str(p)])
    assert main(["dynamic", "hello", str(p), "--mesh"]) == 2
    assert "usage:" in capsys.readouterr().err
