"""Connected-components / dedup-representative semantics."""

from __future__ import annotations

from udacity_data_engineering_capstone_project_spark.operators.dedup import (
    connected_components,
    dedup_representatives,
)


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3 (transitively one cluster though (1,3) never paired),
    # pair 10-11, isolated edge-free nodes are absent from edges
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_deep_chain(spark):
    # a 12-node path exercises multiple propagation iterations
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["id_a", "id_b"]
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert set(comp.values()) == {0}


def test_dedup_representatives(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(6)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], ["id_a", "id_b"])
    out = {
        r["doc_id"]: (r["representative"], r["is_representative"])
        for r in dedup_representatives(docs, pairs, "doc_id").collect()
    }
    assert out[0] == (0, True) and out[1] == (0, False) and out[2] == (0, False)
    assert out[3] == (3, True)  # no edges -> self-representative
    assert out[4] == (4, True) and out[5] == (4, False)


def test_remove_duplicated_segments_line_mode(spark):
    import hashlib

    from udacity_data_engineering_capstone_project_spark.operators.dedup import (
        remove_duplicated_segments,
    )

    boiler = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"unique alpha\n{boiler}\nunique beta"),
            (2, f"{boiler}\nsomething else entirely"),
            (3, "no boilerplate at all"),
            (4, boiler),  # every segment is boilerplate
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in remove_duplicated_segments(
            docs, "doc_id", "text", delimiter="\n", min_docs=2, joiner="\n"
        ).collect()
    }
    assert len(out) == 4  # all-boilerplate doc 4 still present
    assert (out[1]["n_segments"], out[1]["n_kept"]) == (3, 2)
    assert out[1]["cleaned_hash"] == hashlib.md5(
        b"unique alpha\nunique beta"
    ).hexdigest()
    assert (out[2]["n_segments"], out[2]["n_kept"]) == (2, 1)
    assert (out[3]["n_segments"], out[3]["n_kept"]) == (1, 1)
    assert (out[4]["n_segments"], out[4]["n_kept"]) == (1, 0)
    assert out[4]["cleaned_hash"] == hashlib.md5(b"").hexdigest()


def test_segment_documents_window_mode_partial_tail(spark):
    from udacity_data_engineering_capstone_project_spark.operators.dedup import (
        segment_documents,
    )

    docs = spark.createDataFrame([(1, "a b c d e f g h")], ["doc_id", "text"])
    rows = sorted(
        (r["seg_pos"], r["segment"])
        for r in segment_documents(docs, "doc_id", "text", window=3).collect()
    )
    assert rows == [(1, "a b c"), (4, "d e f"), (7, "g h")]


def test_normalize_unicode_forms_and_stripping(spark):
    from udacity_data_engineering_capstone_project_spark.operators.cleaning import (
        normalize_unicode,
    )
    import unicodedata

    rows = [
        (1, "café"),          # e + combining acute -> NFC/NFKC e-acute
        (2, "ﬁｌｅ"),  # ligature fi + fullwidth l, e -> "file"
        (3, "a​b\x00c"),       # zero-width space + NUL stripped
        (4, None),
        (5, "  a   b \n c  "),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])

    nfkc = {r["id"]: r["t"] for r in
            normalize_unicode(df, "t", form="NFKC").collect()}
    assert nfkc[1] == "café"
    assert nfkc[2] == "file"
    assert nfkc[3] == "abc"
    assert nfkc[4] is None

    nfc = {r["id"]: r["t"] for r in
           normalize_unicode(df, "t", form="NFC", strip_control=False).collect()}
    assert nfc[1] == "café"
    assert nfc[2] == "ﬁｌｅ"  # NFC preserves compatibility chars
    assert nfc[3] == "a​b\x00c"
    # python reference parity for every non-null row
    for rid, text in rows:
        if text is not None:
            assert nfc[rid] == unicodedata.normalize("NFC", text)

    coll = {r["id"]: r["t"] for r in
            normalize_unicode(df, "t", collapse_whitespace=True).collect()}
    assert coll[5] == "a b c"

    import pytest as _pytest
    with _pytest.raises(ValueError, match="normalization form"):
        normalize_unicode(df, "t", form="XXX")


def test_normalize_unicode_duckdb_nfc_parity(spark):
    """DuckDB's nfc_normalize is an independent NFC implementation —
    cross-check the Spark path against it character-for-character."""
    import duckdb
    from udacity_data_engineering_capstone_project_spark.operators.cleaning import (
        normalize_unicode,
    )

    samples = ["café", "ﬁx", "ΩÅ", "ṩṡ",
               "x̣̄"]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], ["id", "t"])
    got = {r["id"]: r["t"] for r in
           normalize_unicode(df, "t", form="NFC", strip_control=False).collect()}
    con = duckdb.connect()
    for i, s in enumerate(samples):
        want = con.sql("select nfc_normalize(?)", params=[s]).fetchone()[0]
        assert got[i] == want, (i, s)


def test_fix_mojibake_repairs_and_preserves(spark):
    from udacity_data_engineering_capstone_project_spark.operators.cleaning import (
        fix_mojibake,
    )

    def sloppy_cp1252(b):
        # how real decoders mangle UTF-8: cp1252 per byte, latin-1 for
        # the five unmapped bytes (ftfy's "sloppy-windows-1252")
        return "".join(
            bytes([x]).decode("cp1252", errors="strict")
            if x not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
            else chr(x)
            for x in b
        )

    def corrupt(s, times=1):
        for _ in range(times):
            s = sloppy_cp1252(s.encode("utf-8"))
        return s

    clean = "don’t — café résumé"
    rows = [
        (1, corrupt(clean)),              # single mojibake
        (2, corrupt(clean, times=2)),     # double-encoded
        (3, clean),                       # already correct
        (4, "plain ascii text"),          # nothing to do
        (5, "Ã la mode"),                 # honest Ã + space: must NOT flag
        (6, "नमस्ते दुनिया"),               # non-Latin: untouched
        (7, None),                        # null passes through
    ]
    df = spark.createDataFrame(rows, "id bigint, t string")
    out = {
        r["id"]: (r["t"], r["hit"])
        for r in fix_mojibake(df, "t", flag_column="hit").collect()
    }
    assert out[1] == (clean, True)
    assert out[2] == (clean, True)
    assert out[3] == (clean, False)
    assert out[4] == ("plain ascii text", False)
    assert out[5] == ("Ã la mode", False)
    assert out[6] == ("नमस्ते दुनिया", False)
    assert out[7] == (None, False)


def test_fix_mojibake_never_corrupts(spark):
    """Totality: any string comes back either repaired or identical —
    the round-trip can't damage text it fails to recognize."""
    rows = [
        ("â€ alone",),          # marker fragment that isn't valid UTF-8 bytes
        ("mixed café and donâ€™t",),  # repairable marker + already-good accent
        ("Ã‰tat doubleâ€” text",),
    ]
    from udacity_data_engineering_capstone_project_spark.operators.cleaning import (
        fix_mojibake,
    )

    df = spark.createDataFrame(rows, "t string")
    got = [r["o"] for r in fix_mojibake(df, "t", output_column="o").collect()]
    src = [r[0] for r in rows]
    for before, after in zip(src, got):
        # either unchanged, or every marker sequence got consumed
        assert after == before or "â€" not in after
    # the genuinely-mixed row: the cp1252 encode of 'é' (0xE9) makes the
    # byte stream invalid UTF-8, so the conservative path keeps it as-is
    assert got[1] == "mixed café and donâ€™t"
    assert got[2] == "Ét­at double— text".replace("­", "") or got[2] == "État double— text"


def test_corpus_diff_statuses(spark):
    from udacity_data_engineering_capstone_project_spark.operators.dedup import corpus_diff

    old = spark.createDataFrame(
        [(1, "same text"), (2, "will change"), (3, "will be removed")],
        "doc_id bigint, text string",
    )
    new = spark.createDataFrame(
        [(1, "SAME. text!"), (2, "has changed"), (4, "brand new")],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new, "doc_id", "text").collect()}
    # normalized mode: case/punctuation differences are NOT changes
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
    raw = {r["doc_id"]: r["status"]
           for r in corpus_diff(old, new, "doc_id", "text", normalized=False).collect()}
    assert raw[1] == "changed"  # raw mode sees the punctuation edit


def test_dedup_representatives_prefer_quality(spark):
    from udacity_data_engineering_capstone_project_spark.operators.dedup import (
        dedup_representatives,
    )

    docs = spark.createDataFrame(
        [
            (0, 1.0), (1, 5.0), (2, 3.0),     # cluster {0,1,2}: best is 1
            (3, None),                         # isolated, null score
            (4, 2.0), (5, 2.0),                # cluster {4,5}: tie -> min id 4
            (6, None), (7, 9.0),               # cluster {6,7}: null loses
        ],
        "doc_id bigint, quality double",
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5), (6, 7)], ["id_a", "id_b"]
    )
    out = {
        r["doc_id"]: (r["representative"], r["is_representative"])
        for r in dedup_representatives(docs, pairs, "doc_id", prefer_col="quality").collect()
    }
    assert out[0] == (1, False) and out[1] == (1, True) and out[2] == (1, False)
    assert out[3] == (3, True)
    assert out[4] == (4, True) and out[5] == (4, False)
    assert out[6] == (7, False) and out[7] == (7, True)


def test_corpus_diff_null_text_is_presence_not_phantom(spark):
    from udacity_data_engineering_capstone_project_spark.operators.dedup import corpus_diff

    old = spark.createDataFrame(
        [(1, None), (2, "body"), (3, None)], "doc_id bigint, text string"
    )
    new = spark.createDataFrame(
        [(1, None), (2, None), (4, None)], "doc_id bigint, text string"
    )
    got = {r["doc_id"]: r["status"] for r in corpus_diff(old, new, "doc_id", "text").collect()}
    # null text never fabricates an add/remove: presence is by id
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


# ---------------------------------------------------------------------------
# Edit-distance fuzzy matching (operators/fuzzy.py, r9)


def _brute_levenshtein(a: str, b: str) -> int:
    d = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev, d[0] = d[0], i
        for j in range(1, len(b) + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return d[len(b)]


def test_fuzzy_pairs_matches_brute_force_randomized(spark):
    """Exact precision AND recall of the SymSpell deletion-
    neighborhood blocking vs a python brute force, at k=1 and k=2,
    over a randomized corpus engineered to be near-pair-dense (short
    strings over a tiny alphabet so deletes/substitutions collide)."""
    import random

    from udacity_data_engineering_capstone_project_spark.operators.fuzzy import (
        fuzzy_pairs,
    )

    rng = random.Random(90210)
    rows = [
        (i, "".join(rng.choice("abc") for _ in range(rng.randint(0, 6))))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "id bigint, s string")
    for k in (1, 2):
        got = sorted(
            tuple(r) for r in fuzzy_pairs(df, "id", "s", k).collect()
        )
        want = sorted(
            (x[0], y[0], _brute_levenshtein(x[1], y[1]))
            for i, x in enumerate(rows)
            for y in rows[i + 1 :]
            if _brute_levenshtein(x[1], y[1]) <= k
        )
        assert got == want and len(want) > 50, (k, len(want))


def test_fuzzy_pairs_edges_and_plan(spark):
    """NULL texts never pair; empty strings pair with 1-char strings
    at k=1; max_distance is validated; and the candidate join is an
    equi-join on the key hash (no CartesianProduct / BNLJ — the
    whole point of the blocking)."""
    import pytest as _pytest

    from udacity_data_engineering_capstone_project_spark.operators.fuzzy import (
        fuzzy_pairs,
    )
    from udacity_data_engineering_capstone_project_spark.plans.lint import (
        lint_plan,
        plan_summary,
    )

    df = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, None), (4, "ab")],
        "id bigint, s string",
    )
    out = fuzzy_pairs(df, "id", "s", 1)
    got = sorted(tuple(r) for r in out.collect())
    assert got == [(1, 2, 1), (2, 4, 1)]
    assert plan_summary(out)["bnl_joins"] == 0
    assert not any(
        f["rule"] == "cartesian-product" for f in lint_plan(out)
    )
    with _pytest.raises(ValueError, match="max_distance"):
        fuzzy_pairs(df, "id", "s", 3)


def test_fuzzy_null_texts_emit_no_keys(spark):
    """r9 self-review: NULL texts must emit ZERO blocking keys (not a
    shared xxhash64(NULL) key that funnels every null row into one
    quadratic candidate bucket)."""
    from udacity_data_engineering_capstone_project_spark.operators.fuzzy import (
        deletion_key_hashes,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "ab")], "id bigint, s string"
    )
    keys = df.select(
        "id", F.explode(deletion_key_hashes("s", 2)).alias("k")
    )
    assert {r.id for r in keys.collect()} == {3}


def test_fuzzy_join_reference_brute_force_and_semantics(spark):
    """fuzzy_join_reference (r10, VERDICT r9 #3) vs python brute
    force on a randomized dirty corpus x small clean dim: best_only
    picks (min distance, then min dim id); best_only=False returns
    the full within-bound match set; unmatched and NULL dirty rows
    are absent; NULL dim texts never match."""
    import random

    from udacity_data_engineering_capstone_project_spark.operators.fuzzy import (
        fuzzy_join_reference,
    )

    rng = random.Random(4242)
    dim_rows = [(i, "".join(rng.choice("abc") for _ in range(3)))
                for i in range(20)] + [(99, None)]
    dirty_rows = [
        (100 + i, "".join(rng.choice("abcd") for _ in range(rng.randint(0, 5))))
        for i in range(150)
    ] + [(990, None)]
    dim = spark.createDataFrame(dim_rows, "dim_id bigint, name string")
    dirty = spark.createDataFrame(dirty_rows, "rec_id bigint, name string")

    for k in (1, 2):
        brute = {}
        for rid, s in dirty_rows:
            if s is None:
                continue
            ms = sorted(
                (_brute_levenshtein(s, t), did)
                for did, t in dim_rows
                if t is not None and _brute_levenshtein(s, t) <= k
            )
            if ms:
                brute[rid] = ms
        got_best = sorted(
            tuple(r)
            for r in fuzzy_join_reference(
                dirty, "rec_id", "name", dim, "dim_id", "name", max_distance=k
            ).collect()
        )
        want_best = sorted(
            (rid, ms[0][1], ms[0][0]) for rid, ms in brute.items()
        )
        assert got_best == want_best and len(want_best) > 10, (k, len(want_best))

        got_all = sorted(
            tuple(r)
            for r in fuzzy_join_reference(
                dirty, "rec_id", "name", dim, "dim_id", "name",
                max_distance=k, best_only=False,
            ).collect()
        )
        want_all = sorted(
            (rid, did, d) for rid, ms in brute.items() for d, did in ms
        )
        assert got_all == want_all

        # keep_unmatched=True (r11, VERDICT r10 #5): LEFT semantics —
        # every dirty row (including the NULL-text one) appears; rows
        # without a within-bound match carry NULL dim id + distance
        got_left = sorted(
            tuple(r)
            for r in fuzzy_join_reference(
                dirty, "rec_id", "name", dim, "dim_id", "name",
                max_distance=k, keep_unmatched=True,
            ).collect()
        )
        want_left = sorted(
            (rid, ms[0][1], ms[0][0]) if (ms := brute.get(rid)) else (rid, None, None)
            for rid, _ in dirty_rows
        )
        assert got_left == want_left
        n_unmatched = sum(1 for _, d, _dist in want_left if d is None)
        assert n_unmatched > 5, n_unmatched  # the miss slate is exercised


def test_fuzzy_join_reference_plan_is_broadcast_no_cartesian(spark):
    """The candidate join must be a broadcast equi-join on the key
    hash for a provably-small dim (driver-local -> annotated small):
    no cartesian/BNL, no shuffle of the dirty side before the join."""
    from udacity_data_engineering_capstone_project_spark.operators.fuzzy import (
        fuzzy_join_reference,
    )
    from udacity_data_engineering_capstone_project_spark.plans.lint import (
        lint_plan,
        plan_summary,
    )

    dim = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "dim_id bigint, name string"
    )
    dirty = spark.createDataFrame(
        [(10, "alpa"), (11, "betta"), (12, "zzzzzz")],
        "rec_id bigint, name string",
    )
    out = fuzzy_join_reference(
        dirty, "rec_id", "name", dim, "dim_id", "name", max_distance=1
    )
    summ = plan_summary(out)
    assert summ["bnl_joins"] == 0
    assert summ["broadcast_joins"] >= 1, summ
    assert not any(f["rule"] == "cartesian-product" for f in lint_plan(out))
    assert sorted(tuple(r) for r in out.collect()) == [
        (10, 1, 1), (11, 2, 1)
    ]
