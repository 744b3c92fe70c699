"""Boolean query parser + evaluation: tantivy QueryParser-subset semantics.

Parser shapes are pinned structurally; evaluation is checked engine-vs-
oracle (rank + f32 score bit identity) on the shared tiny index.
"""

import numpy as np
import pytest

from ck_ray.oracle import BM25Oracle
from ck_ray.query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BM25Engine,
    BoolNode,
    Clause,
    parse_query,
)


# ------------------------------------------------------------------ parser


def test_field_prefixed_quoted_phrase():
    """path:"foo bar" is a PHRASE on the path field (ADVICE r1 fix)."""
    node = parse_query('path:"foo bar"')
    assert isinstance(node, Clause)
    assert node.field == "path" and node.terms == ["foo", "bar"]


def test_and_promotes_both_sides():
    node = parse_query("merge AND window")
    assert isinstance(node, BoolNode)
    assert [(o, c.terms) for o, c in node.children] == [
        (MUST, ["merge"]),
        (MUST, ["window"]),
    ]


def test_or_groups_should():
    node = parse_query("merge OR window")
    assert [(o, c.terms) for o, c in node.children] == [
        (SHOULD, ["merge"]),
        (SHOULD, ["window"]),
    ]


def test_not_and_minus_are_must_not():
    for q in ("merge -window", "merge NOT window"):
        node = parse_query(q)
        assert [(o, c.terms) for o, c in node.children] == [
            (SHOULD, ["merge"]),
            (MUST_NOT, ["window"]),
        ], q


def test_plus_is_must():
    node = parse_query("+merge window")
    assert [(o, c.terms) for o, c in node.children] == [
        (MUST, ["merge"]),
        (SHOULD, ["window"]),
    ]


def test_parens_nest():
    node = parse_query("(merge OR window) AND batch")
    assert [o for o, _ in node.children] == [MUST, MUST]
    inner = node.children[0][1]
    assert isinstance(inner, BoolNode)
    assert [(o, c.terms) for o, c in inner.children] == [
        (SHOULD, ["merge"]),
        (SHOULD, ["window"]),
    ]
    assert node.children[1][1].terms == ["batch"]


def test_and_binds_tighter_than_or():
    node = parse_query("merge AND window OR batch")
    assert [o for o, _ in node.children] == [SHOULD, SHOULD]
    left = node.children[0][1]
    assert [(o, c.terms) for o, c in left.children] == [
        (MUST, ["merge"]),
        (MUST, ["window"]),
    ]
    assert node.children[1][1].terms == ["batch"]


def test_negated_phrase_and_field():
    node = parse_query('-"merge window" +path:core')
    assert [o for o, _ in node.children] == [MUST_NOT, MUST]
    assert node.children[0][1].terms == ["merge", "window"]
    assert node.children[1][1].field == "path"


def test_lenient_degenerate_queries():
    assert parse_query("") is None
    assert parse_query("AND OR NOT") is None
    assert parse_query("(((") is None
    # hyphenated word is a phrase, not a negation
    node = parse_query("foo-bar")
    assert isinstance(node, Clause) and node.terms == ["foo", "bar"]
    # lowercase and/or are plain terms
    node = parse_query("merge and window")
    assert all(o == SHOULD for o, _ in node.children)
    assert [c.terms for _, c in node.children] == [["merge"], ["and"], ["window"]]




def test_boost_on_term():
    node = parse_query("merge^2")
    assert isinstance(node, Clause)
    assert node.terms == ["merge"] and node.boost == 2.0


def test_boost_on_phrase_field_and_group():
    node = parse_query('"merge window"^0.5')
    assert isinstance(node, Clause) and node.boost == 0.5
    node = parse_query("path:core^3")
    assert node.field == "path" and node.boost == 3.0
    node = parse_query("(merge OR window)^2 AND batch")
    inner = node.children[0][1]
    assert isinstance(inner, BoolNode) and inner.boost == 2.0
    assert node.children[1][1].boost == 1.0


def test_boost_lenient_degenerates():
    # non-numeric suffix -> not a boost; ^ splits the word into a phrase
    node = parse_query("x^y")
    assert isinstance(node, Clause) and node.terms == ["x", "y"]
    assert node.boost == 1.0
    # dangling boost with no atom parses to nothing
    assert parse_query("^2") is None
    # stacked boosts multiply
    node = parse_query("merge^2^3")
    assert node.boost == 6.0


# -------------------------------------------------------------- evaluation

BOOL_QUERIES = [
    "merge AND window",
    "merge AND window AND batch",
    "merge OR window",
    "merge -window",
    "merge NOT window",
    "+merge window batch",
    "(merge OR window) AND batch",
    "merge AND window OR batch stream",
    "def AND return -the",
    "merge AND snake_case",  # must + phrase
    '"the merge" AND window',
    "path:core AND merge",
    "merge AND absent_zzqq",  # must on absent term -> 0 hits
    "-merge",  # pure negative -> 0 hits
    "merge -merge",  # self-excluding -> 0 hits
    "merge AND (window OR batch) -stream",
    "merge^2 window",  # boosted SHOULD reranks
    'merge AND "the merge"^2',  # boosted phrase in conjunction
    "(merge OR window)^0.5 AND batch^3",  # group + term boosts
    "path:core^2 merge",
]


@pytest.fixture(scope="module")
def bool_engine(ray_session, tiny_index):
    eng = BM25Engine(tiny_index, num_shards=2)
    yield eng
    eng.close()


@pytest.fixture(scope="module")
def bool_oracle(tiny_corpus):
    return BM25Oracle(tiny_corpus)


@pytest.mark.parametrize("q", BOOL_QUERIES, ids=[q[:28] for q in BOOL_QUERIES])
def test_boolean_rank_identity(bool_engine, bool_oracle, q):
    de, se = bool_engine.search_raw(q, 50)
    do, so = bool_oracle.search_raw(q, 50)
    assert de.tolist() == do.tolist(), f"{q}: docs differ"
    assert np.array_equal(se, so), f"{q}: scores differ"


def test_boolean_set_semantics(bool_engine):
    """Containment relations the boolean operators must satisfy."""
    all_merge = set(bool_engine.search_raw("merge", 10_000)[0].tolist())
    all_window = set(bool_engine.search_raw("window", 10_000)[0].tolist())
    conj = set(bool_engine.search_raw("merge AND window", 10_000)[0].tolist())
    disj = set(bool_engine.search_raw("merge OR window", 10_000)[0].tolist())
    excl = set(bool_engine.search_raw("merge -window", 10_000)[0].tolist())
    assert conj == all_merge & all_window
    assert disj == all_merge | all_window
    assert excl == all_merge - all_window
    assert bool_engine.search_raw("-merge", 100)[0].size == 0
    assert bool_engine.search_raw("merge AND absent_zzqq", 100)[0].size == 0


def test_conjunction_scores_sum_both_terms(bool_engine):
    """Score of a doc under `a AND b` = score(a) + score(b) for that doc."""
    da, sa = bool_engine.search_raw("merge", 10_000)
    db, sb = bool_engine.search_raw("window", 10_000)
    dc, sc = bool_engine.search_raw("merge AND window", 10_000)
    ma = dict(zip(da.tolist(), sa.tolist()))
    mb = dict(zip(db.tolist(), sb.tolist()))
    for d, s in zip(dc.tolist(), sc.tolist()):
        assert s == np.float32(np.float32(ma[d]) + np.float32(mb[d]))


def test_slop_suffix_on_quoted_phrase():
    node = parse_query('"merge window"~2')
    assert isinstance(node, Clause)
    assert node.terms == ["merge", "window"] and node.slop == 2


def test_slop_then_boost_and_field():
    node = parse_query('path:"a b"~1^3')
    assert node.field == "path" and node.slop == 1 and node.boost == 3.0


def test_slop_on_single_token_quoted_is_ignored():
    node = parse_query('"solo"~4')
    assert node.terms == ["solo"] and node.slop == 0


def test_bare_tilde_is_lenient():
    node = parse_query('"a b"~')
    assert node.terms == ["a", "b"] and node.slop == 0


def test_slop_zero_suffix_equals_exact():
    a = parse_query('"merge window"~0')
    b = parse_query('"merge window"')
    assert a.terms == b.terms and a.slop == b.slop == 0


def test_prefix_parse_shapes():
    n = parse_query("mer*")
    assert isinstance(n, Clause) and n.prefix and n.terms == ["mer"]
    n = parse_query("path:sub*")
    assert n.field == "path" and n.prefix
    # multi-token word: star dropped leniently, stays a phrase
    n = parse_query("foo_bar*")
    assert n.terms == ["foo", "bar"] and not n.prefix
    # bare star is the AllQuery (tantivy `*`), no longer dropped
    assert parse_query("*").match_all
    n = parse_query("* merge")
    assert isinstance(n, BoolNode)
    assert n.children[0][1].match_all
    assert n.children[1][1].terms == ["merge"]


def test_prefix_expansion_cap():
    from ck_ray.query import MAX_PREFIX_EXPANSIONS, expand_prefix_tree

    big = [f"t{i:05d}" for i in range(MAX_PREFIX_EXPANSIONS + 1)]
    with pytest.raises(ValueError):
        expand_prefix_tree(parse_query("t*"), lambda f, p: big)


def test_prefix_empty_expansion_is_absent_term():
    from ck_ray.query import expand_prefix_tree

    node = expand_prefix_tree(parse_query("zz*"), lambda f, p: [])
    assert isinstance(node, Clause) and not node.prefix
    assert node.terms[0].startswith("\x00")


def test_phrase_prefix_parse():
    n = parse_query('"merge wi"*')
    assert n.terms == ["merge", "wi"] and n.prefix and n.is_phrase
    n = parse_query('path:"src f00"*^2')
    assert n.field == "path" and n.prefix and n.boost == 2.0
    n = parse_query('"a b"*~1')  # star then slop both bind
    assert n.prefix and n.slop == 1


def test_phrase_prefix_expansion_shares_head():
    from ck_ray.query import BoolNode, SHOULD, expand_prefix_tree

    node = expand_prefix_tree(
        parse_query('"merge wi"*~2'),
        lambda f, p: ["window", "wide"] if p == "wi" else [],
    )
    assert isinstance(node, BoolNode)
    assert [(o, c.terms, c.slop) for o, c in node.children] == [
        (SHOULD, ["merge", "window"], 2),
        (SHOULD, ["merge", "wide"], 2),
    ]


# --------------------------------------------- const-score family (tantivy
# AllQuery `*`, TermSetQuery `field: IN [a b c]`, RangeQuery `[a TO b]`)


def test_range_parse_shapes():
    n = parse_query("[mer TO met}")
    assert n.const_score and n.range_spec == ("mer", "met", True, False)
    n = parse_query("path:{aa TO zz]^2")
    assert n.field == "path" and n.boost == 2.0
    assert n.range_spec == ("aa", "zz", False, True)
    n = parse_query("[* TO mm]")
    assert n.range_spec == (None, "mm", True, True)
    n = parse_query("[mm TO *]")
    assert n.range_spec == ("mm", None, True, True)
    # unclosed bracket is lenient (inclusive close at end of input)
    n = parse_query("[aa TO bb")
    assert n.range_spec == ("aa", "bb", True, True)


def test_termset_and_matchall_parse_shapes():
    n = parse_query("IN [Alpha BETA alpha]")
    assert n.const_score and n.terms == ["alpha", "beta"]
    n = parse_query("path: IN [a b]")
    assert n.field == "path" and n.terms == ["a", "b"]
    n = parse_query("*")
    assert n.match_all and n.const_score
    n = parse_query("*^3")
    assert n.match_all and n.boost == 3.0
    # dangling IN degrades to the plain term, fieldmark drops
    assert parse_query("IN").terms == ["in"]
    assert parse_query("path: merge") is not None
    # empty set is the unmatchable term
    assert parse_query("IN [ ]").terms[0].startswith("\x00")


CONST_QUERIES = [
    "[merge TO mergf}",          # range covering exactly 'merge'
    "[a TO zzzz]",               # wide range (many dictionary terms)
    "{merge TO merge}",          # empty exclusive interval
    "[zzz TO aaa]",              # inverted interval -> empty
    "[* TO f]",                  # open low side
    "[t TO *]",                  # open high side
    "IN [merge window absent_zzqq]",
    "IN [absent_zzqq]",
    "*",
    "* -merge",
    "*^2 AND merge",
    "merge OR [w TO x}^2",       # const leaf mixed with scored leaf
    "+[a TO c} -window",
    "path:[src TO srd}",         # range on the path field
]


@pytest.mark.parametrize(
    "q", CONST_QUERIES, ids=[q[:28] for q in CONST_QUERIES]
)
def test_const_score_rank_identity(bool_engine, bool_oracle, q):
    de, se = bool_engine.search_raw(q, 50, pruning=False)
    do, so = bool_oracle.search_raw(q, 50)
    assert de.tolist() == do.tolist(), f"{q}: docs differ"
    assert np.array_equal(se, so), f"{q}: scores differ"
    dp, sp = bool_engine.search_raw(q, 50, pruning=True)
    assert dp.tolist() == de.tolist() and np.array_equal(sp, se)


def test_matchall_covers_every_live_doc(bool_engine, bool_oracle):
    """`*` returns every doc exactly once with score 1.0, engine and
    oracle alike; `* -t` is its complement of t's matches."""
    d_all, s_all = bool_engine.search_raw("*", 10_000)
    assert len(d_all) == bool_oracle.n_docs
    assert set(s_all.tolist()) == {1.0}
    d_m = set(bool_engine.search_raw("merge", 10_000)[0].tolist())
    d_not = set(bool_engine.search_raw("* -merge", 10_000)[0].tolist())
    assert d_not == set(d_all.tolist()) - d_m


def test_termset_is_union_of_members(bool_engine):
    """IN [a b] matches exactly union(a, b), each doc scoring 1.0 once
    (set membership, not a scored disjunction)."""
    da = set(bool_engine.search_raw("merge", 10_000)[0].tolist())
    db = set(bool_engine.search_raw("window", 10_000)[0].tolist())
    ds, ss = bool_engine.search_raw("IN [merge window]", 10_000)
    assert set(ds.tolist()) == da | db
    assert set(ss.tolist()) == {1.0}


def test_range_expansion_matches_dictionary_interval(bool_engine, bool_oracle):
    """The engine's shard-union range expansion equals the oracle's
    global-dictionary interval scan, bounds and exclusivity included."""
    import ray

    for lo, hi, il, ih in [
        ("m", "n", True, False),
        ("merge", "mergf", True, True),
        ("a", "c", False, False),
        (None, "d", True, True),
        ("w", None, True, True),
    ]:
        per = ray.get(
            [
                s.expand_ranges.remote([("content", lo, hi, il, ih)])
                for s in bool_engine.shards
            ]
        )
        got = sorted({t for sh in per for t in sh[0]})
        want = bool_oracle._expand_range("content", lo, hi, il, ih)
        assert got == want, (lo, hi, il, ih)


def test_range_expansion_cap_is_enforced(bool_engine, bool_oracle):
    """A range spanning (nearly) the whole dictionary must raise the
    global MAX_PREFIX_EXPANSIONS guard on engine and oracle alike —
    IF the tiny corpus dictionary exceeds the cap; otherwise it must
    return cleanly on both (the cap logic is unit-tested below)."""
    from ck_ray.query import MAX_PREFIX_EXPANSIONS, expand_prefix_tree

    n_terms = len(bool_oracle._expand_range("content", None, None, True, True))
    if n_terms > MAX_PREFIX_EXPANSIONS:
        with pytest.raises(ValueError, match="expands to"):
            bool_engine.search_raw("[* TO *]", 5)
        with pytest.raises(ValueError, match="expands to"):
            bool_oracle.search_raw("[* TO *]", 5)
    # unit-level: the rewrite itself enforces the cap
    big = [f"t{i:05d}" for i in range(MAX_PREFIX_EXPANSIONS + 1)]
    with pytest.raises(ValueError, match="expands to"):
        expand_prefix_tree(
            parse_query("[a TO z]"), lambda f, p: [],
            lambda f, lo, hi, il, ih: big,
        )


def test_empty_range_is_unmatchable_not_matchall(bool_engine):
    """An empty interval matches nothing — and as a MUST child it must
    kill the whole conjunction (absent-term semantics)."""
    assert bool_engine.search_raw("[zzz TO aaa]", 100)[0].size == 0
    assert bool_engine.search_raw("+[zzz TO aaa] merge", 100)[0].size == 0


# ------------------------------------------------- fuzzy term queries ~N


def test_fuzzy_parse_shapes():
    """Lucene `term~N` suffix: distance parses, clamps to 2, bare `~`
    defaults to 2, `~0` degrades to the exact term, and ^/~ suffixes
    compose in either order."""
    node = parse_query("spal~1")
    assert isinstance(node, Clause)
    assert node.terms == ["spal"] and node.fuzzy == 1
    assert not node.const_score  # rewrite happens at expansion time
    assert parse_query("spal~").fuzzy == 2
    assert parse_query("spal~7").fuzzy == 2  # clamp to the automaton max
    assert parse_query("spal~0").fuzzy == 0
    for q in ("spal~1^2", "spal^2~1"):
        n = parse_query(q)
        assert n.fuzzy == 1 and n.boost == 2.0, q
    f = parse_query("path:spal~1")
    assert f.field == "path" and f.fuzzy == 1


def test_fuzzy_ignored_where_undefined():
    """Fuzzy on phrases, prefix queries, and const-score groups is
    dropped leniently (FuzzyTermQuery is a TERM query)."""
    assert parse_query('"merge window"~2').slop == 2  # quoted ~ = slop
    n = parse_query("a~b~1")  # mid-word ~ splits into a phrase
    assert n.terms == ["a", "b"] and n.fuzzy == 0
    p = parse_query("mer*~1")
    assert p.fuzzy == 0 or not p.prefix  # never both


FUZZY_QUERIES = [
    "merge~1",                      # exact term + its 1-neighborhood
    "windw~1",                      # typo: only fuzzy hits
    "window spal~2",                # scored + const-score mix
    "merge~2 AND window",           # fuzzy under MUST
    "+window -merge~1",             # fuzzy under MUST_NOT
    "(merge~1 OR batch)^2 window",  # boosted group
    "zzqqxx~1",                     # empty expansion = unmatchable
]


@pytest.mark.parametrize("q", FUZZY_QUERIES, ids=[q[:24] for q in FUZZY_QUERIES])
def test_fuzzy_rank_identity(bool_engine, bool_oracle, q):
    """Engine (vectorized strdist kernel, shard-local dictionaries) vs
    oracle (scalar DP, corpus-global dictionary): rank + f32 score
    identity — also proves shard-local expansion == global expansion
    for the const-score rewrite."""
    de, se = bool_engine.search_raw(q, 50)
    do, so = bool_oracle.search_raw(q, 50)
    assert de.tolist() == do.tolist(), f"{q}: docs differ"
    assert np.array_equal(se, so), f"{q}: scores differ"


def test_fuzzy_matches_are_const_scored(bool_engine, bool_oracle):
    """A pure fuzzy query scores every match exactly 1.0 (tantivy
    AutomatonWeight -> ConstScorer), regardless of tf/idf."""
    docs, scores = bool_engine.search_raw("merge~1", 10_000)
    assert len(docs) > 0
    assert np.all(scores == np.float32(1.0))
    # and the match set is the union of the expanded terms' doc sets
    exp = bool_oracle._expand_fuzzy("content", "merge", 1)
    assert "merge" in exp
    want = set()
    for t in exp:
        want |= set(bool_engine.search_raw(t, 10_000)[0].tolist())
    assert set(docs.tolist()) == want


def test_fuzzy_transpose_variant_expands_osa():
    """The programmatic transposition_cost_one flavor rides the same
    rewrite: an adjacent-transposed term is distance 1 under OSA but 2
    under plain Levenshtein."""
    from ck_ray.query import expand_prefix_tree

    dictionary = ["spark", "sprak", "spars", "shark"]

    def fz(field, term, dist, transpose):
        from ck_ray.strdist import edit_within

        mask = edit_within(term, dictionary, dist, transpose=transpose)
        return [t for t, b in zip(dictionary, mask) if b]

    # spark<->sprak is a pure adjacent transposition: plain distance 2,
    # OSA distance 1 — so the two flavors expand differently at ~1
    from ck_ray.strdist import edit_distance

    assert edit_distance("sprak", "spark") == 2
    assert edit_distance("sprak", "spark", transpose=True) == 1

    plain = parse_query("sprak~1")
    got = expand_prefix_tree(plain, lambda f, p: [], None, fz)
    assert got.const_score and got.terms == ["sprak"]

    osa = parse_query("sprak~1")
    osa.fuzzy_transpose = True
    got2 = expand_prefix_tree(osa, lambda f, p: [], None, fz)
    assert got2.const_score and got2.terms == ["spark", "sprak"]


def test_fuzzy_expansion_cap_enforced():
    from ck_ray.query import MAX_PREFIX_EXPANSIONS, expand_prefix_tree

    big = [f"t{i:05d}" for i in range(MAX_PREFIX_EXPANSIONS + 1)]
    with pytest.raises(ValueError, match="expands to"):
        expand_prefix_tree(
            parse_query("term~2"), lambda f, p: [], None,
            lambda f, t, d, tr: big,
        )


# ----------------------------------------------- regex term queries /pat/


def test_regex_parse_shapes():
    """Lucene `/pat/` syntax: bare at token boundary (whitespace allowed
    inside), field-prefixed (stop-char-free), boost suffix, and lenient
    unclosed pattern."""
    node = parse_query("/me.*ge/")
    assert isinstance(node, Clause)
    assert node.const_score and node.regex_spec == "me.*ge"
    assert node.terms == []
    f = parse_query("path:/core[0-9]+/")
    assert f.field == "path" and f.regex_spec == "core[0-9]+"
    b = parse_query("/abc/^3")
    assert b.regex_spec == "abc" and b.boost == 3.0
    n = parse_query("window /s(k|m)/")
    assert [(o, getattr(c, "regex_spec", None)) for o, c in n.children] == [
        (SHOULD, None), (SHOULD, "s(k|m)"),
    ]
    u = parse_query("/unclosed")  # lenient: runs to end of query
    assert u.regex_spec == "unclosed"
    esc = parse_query(r"/a\/b/")  # escaped slash stays inside the pattern
    assert esc.regex_spec == r"a\/b"


REGEX_QUERIES = [
    "/merge/",               # exact-term regex
    "/me.*/ AND window",     # prefix-shaped regex under MUST
    "window /w.(n|q).*/",    # alternation mix
    "+/.*dow/ -merge",       # suffix-shaped under MUST with exclusion
    "/zz[0-9]/",             # digit class
    "/nomatch_qqzz.*/",      # empty expansion = unmatchable
]


@pytest.mark.parametrize("q", REGEX_QUERIES, ids=[q[:24] for q in REGEX_QUERIES])
def test_regex_rank_identity(bool_engine, bool_oracle, q):
    """Engine (shard-local dictionary fullmatch) vs oracle (global
    dictionary): rank + f32 score identity."""
    de, se = bool_engine.search_raw(q, 50)
    do, so = bool_oracle.search_raw(q, 50)
    assert de.tolist() == do.tolist(), f"{q}: docs differ"
    assert np.array_equal(se, so), f"{q}: scores differ"


def test_regex_is_anchored_and_const_scored(bool_engine):
    """tantivy RegexQuery matches WHOLE terms: /erge/ must NOT match
    'merge'; matches score exactly 1.0."""
    assert bool_engine.search_raw("/erge/", 100)[0].size == 0
    docs, scores = bool_engine.search_raw("/merge/", 10_000)
    exact, _ = bool_engine.search_raw("merge", 10_000)
    assert set(docs.tolist()) == set(exact.tolist())
    assert np.all(scores == np.float32(1.0))


def test_regex_invalid_pattern_raises(bool_engine, bool_oracle):
    with pytest.raises(ValueError, match="bad regex"):
        bool_engine.search_raw("/[unclosed/", 5)
    with pytest.raises(ValueError, match="bad regex"):
        bool_oracle.search_raw("/[unclosed/", 5)


def test_regex_expansion_cap_enforced():
    from ck_ray.query import MAX_PREFIX_EXPANSIONS, expand_prefix_tree

    big = [f"t{i:05d}" for i in range(MAX_PREFIX_EXPANSIONS + 1)]
    with pytest.raises(ValueError, match="expands to"):
        expand_prefix_tree(
            parse_query("/t.*/"), lambda f, p: [], None, None,
            lambda f, pat: big,
        )


# ----------------------------------------------- wildcard queries te?t


def test_wildcard_parse_shapes():
    """Lucene WildcardQuery split: `?` anywhere or a non-trailing `*`
    makes a wildcard (rewritten to an anchored regex clause at parse
    time); a single trailing `*` run stays the scored PREFIX query —
    the same split Lucene's QueryParser makes."""
    w = parse_query("te?t")
    assert isinstance(w, Clause) and w.const_score
    assert w.regex_spec == "te.t" and w.terms == []
    assert parse_query("m*ge").regex_spec == "m.*ge"
    assert parse_query("*fix").regex_spec == ".*fix"
    f = parse_query("path:ma?n")
    assert f.field == "path" and f.regex_spec == "ma.n"
    b = parse_query("w?nd*w^2")
    assert b.regex_spec == "w.nd.*w" and b.boost == 2.0
    # trailing-star-only stays a prefix query (scored, not const)
    p = parse_query("te*")
    assert p.prefix and not p.const_score and p.terms == ["te"]
    # literal non-alnum chars are escaped, never regex metachars
    assert parse_query("a.b?c").regex_spec == r"a\.b.c"
    # fuzzy suffix on a wildcard is ignored leniently
    assert parse_query("te?t~1").regex_spec == "te.t"


WILDCARD_QUERIES = [
    "m?rge",                 # single-char hole
    "wind?w AND merge",      # wildcard under MUST with a scored term
    "w*w",                   # bounded both ends, any middle
    "+*dow -spark",          # leading wildcard under MUST with exclusion
    "s??rk window",          # two holes mixed with a scored term
    "zz?qq*zz",              # unmatchable
]


@pytest.mark.parametrize(
    "q", WILDCARD_QUERIES, ids=[q[:24] for q in WILDCARD_QUERIES]
)
def test_wildcard_rank_identity(bool_engine, bool_oracle, q):
    """Engine (shard-local dictionary expansion) vs oracle (global
    dictionary): rank + f32 score identity."""
    de, se = bool_engine.search_raw(q, 50)
    do, so = bool_oracle.search_raw(q, 50)
    assert de.tolist() == do.tolist(), f"{q}: docs differ"
    assert np.array_equal(se, so), f"{q}: scores differ"


def test_wildcard_equals_regex_rewrite(bool_engine):
    """`m*ge` is exactly `/m.*ge/` — same docs, same const scores."""
    dw, sw = bool_engine.search_raw("m*ge", 10_000)
    dr, sr = bool_engine.search_raw("/m.*ge/", 10_000)
    assert dw.tolist() == dr.tolist()
    assert np.array_equal(sw, sr)
    assert np.all(sw == np.float32(1.0))


# --------------------------------------------------------- more-like-this


def test_mlt_selection_rule(bool_engine, bool_oracle, tiny_corpus):
    """Term selection = tf * BM25-idf, ranked desc with term-asc
    tiebreak, min_doc_freq/min_term_freq filters, max_query_terms cut —
    verified against a hand computation from the corpus."""
    import collections
    import math

    from ck_ray.tokenizer import tokenize_text

    text = "merge merge window zzabsentzz the"
    # hand-compute on the oracle's corpus-global postings
    tf = collections.Counter(tokenize_text(text))
    n = tiny_corpus.num_rows
    scored = []
    for t, c in tf.items():
        df = len(bool_oracle.postings[0].get(t, {}))
        if df >= 1:
            scored.append((-c * math.log1p((n - df + 0.5) / (df + 0.5)), t))
    want_all = [t for _, t in sorted(scored)]
    got = bool_engine.select_like_terms(text, max_query_terms=2,
                                        min_doc_freq=1)
    assert got == want_all[:2]
    # absent term never selected even with min_doc_freq=1
    assert "zzabsentzz" not in bool_engine.select_like_terms(
        text, max_query_terms=10, min_doc_freq=1
    )
    # min_term_freq=2 keeps only the repeated term
    only_rep = bool_engine.select_like_terms(
        text, max_query_terms=10, min_term_freq=2, min_doc_freq=1
    )
    assert only_rep == ["merge"]


def test_mlt_search_equals_disjunction(bool_engine, bool_oracle):
    """more_like_this == search over the selected terms (the rewrite is
    transparent), and matches the oracle on that disjunction."""
    text = "merge window merge batch"
    terms = bool_engine.select_like_terms(text, max_query_terms=2,
                                          min_doc_freq=1)
    assert len(terms) == 2
    df = bool_engine.more_like_this(text, top_k=30, max_query_terms=2,
                                    min_doc_freq=1, with_metadata=False)
    de, se = bool_oracle.search_raw(" ".join(terms), 30)
    assert df["doc_id"].tolist() == de.tolist()
    assert np.array_equal(df["score"].to_numpy(np.float32), se)


def test_mlt_empty_and_absent_text(bool_engine):
    assert bool_engine.more_like_this("", top_k=5).empty
    assert bool_engine.more_like_this("zz_only_absent_qq", top_k=5).empty


# ------------------------------------------------------------ facet counts


FACET_QUERIES = [
    "merge",
    "merge AND window -batch",
    "mer* OR window",          # expansion leaf inside a facet query
    "merge~1",                 # fuzzy leaf
    "* -merge",                # match-all with exclusion
    "absent_zzqq",             # empty match set
]


@pytest.mark.parametrize("q", FACET_QUERIES, ids=[q[:24] for q in FACET_QUERIES])
def test_facet_counts_match_oracle_matchset(
    bool_engine, bool_oracle, tiny_corpus, q
):
    """Total + per-facet counts must equal the oracle's full match set
    bucketed by the corpus lang column (collector over ALL matches,
    not top-k)."""
    import collections

    from ck_ray.ids import doc_id_for

    total, facets = bool_engine.search_facets(q, "lang")
    docs, _ = bool_oracle.search_raw(q, 10_000_000)
    assert total == len(docs)
    lang_of = {
        doc_id_for(r["repo"], r["path"], r["commit"]): r["lang"]
        for r in tiny_corpus.to_pylist()
    }
    want = collections.Counter(lang_of[int(d)] for d in docs.tolist())
    assert facets == dict(want)
    assert sum(facets.values()) == total


def test_facet_counts_sum_across_shards(ray_session, tiny_index):
    """1-shard and 2-shard engines must produce identical facet tables
    (the merge is a plain per-bucket integer sum)."""
    e1 = BM25Engine(tiny_index, num_shards=1)
    e2 = BM25Engine(tiny_index, num_shards=2)
    try:
        for q in ("merge", "merge OR window", "*"):
            assert e1.search_facets(q) == e2.search_facets(q), q
    finally:
        e1.close()
        e2.close()


def test_facet_unknown_field_raises(bool_engine):
    import pytest as _pt
    with _pt.raises(Exception, match="no such facet field"):
        bool_engine.search_facets("merge", "nonexistent_col")
