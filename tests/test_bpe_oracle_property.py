"""Property tests for the BPE oracle SQL itself (no Spark needed).

The learn/encode oracles rest on the separator-encoding trick: applying
merge (l, r) == plain substring replace over SEP-wrapped symbols, whose
left-to-right non-overlap semantics is the BPE merge rule. Adversarial
corpora (repeated chars, symbols that are substrings or concatenations
of other symbols) are exactly where a naive encoding breaks — so fuzz
DuckDB against an independent pure-Python reference.
"""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from fourmc_spark.queries import _bpe_encode_sql, _bpe_learn_sql

END = "</w>"


def _ref_learn(texts, n_merges):
    freqs = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                freqs[w] += 1
    vocab = {tuple(list(w) + [END]): c for w, c in freqs.items()}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, cnt))
        new = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    return merges


def _ref_encode(text, merges):
    def enc(w):
        syms = list(w) + [END]
        for l, r, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    return [t for w in text.split(" ") if w for t in enc(w)]


def _docs_con(texts):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in enumerate(texts))
        + ") t(doc_id, text)"
    )
    return con


# tiny alphabet maximizes merge collisions ("aaaa" etc.) — the
# adversarial regime for the separator-replace encoding
word = st.text(alphabet="ab", min_size=1, max_size=6)
doc = st.lists(word, min_size=0, max_size=8).map(" ".join)
corpus = st.lists(doc, min_size=1, max_size=5)


@settings(max_examples=25, deadline=None)
@given(texts=corpus, n_merges=st.integers(min_value=1, max_value=6))
def test_learn_oracle_matches_reference(texts, n_merges):
    con = _docs_con(texts)
    got = [
        (r[1], r[2], int(r[3]))
        for r in con.execute(_bpe_learn_sql(n_merges)).fetchall()
    ]
    assert got == _ref_learn(texts, n_merges)


@settings(max_examples=25, deadline=None)
@given(texts=corpus, n_merges=st.integers(min_value=1, max_value=6))
def test_encode_oracle_matches_reference(texts, n_merges):
    con = _docs_con(texts)
    merges = _ref_learn(texts, n_merges)
    rows = con.execute(_bpe_encode_sql(n_merges)).fetchall()
    got = {r[0]: (list(r[1]), int(r[2])) for r in rows}
    for i, t in enumerate(texts):
        want = _ref_encode(t, merges)
        if not want:
            assert i not in got  # no non-empty word -> no row
        else:
            assert got[i] == (want, len(want)), i


def test_learn_oracle_pathological_repeats():
    # "aaaa" + merge (a,a) must yield [aa, aa], never [aa, a, a] — the
    # exact case a single-separator encoding gets wrong
    texts = ["aaaa aaaa aaa", "aa aaaa"]
    con = _docs_con(texts)
    got = [
        (r[1], r[2], int(r[3]))
        for r in con.execute(_bpe_learn_sql(4)).fetchall()
    ]
    assert got == _ref_learn(texts, 4)


@pytest.mark.parametrize("texts", [["a" * 30], ["ab" * 15 + " " + "ba" * 15]])
def test_encode_oracle_long_runs(texts):
    con = _docs_con(texts)
    merges = _ref_learn(texts, 5)
    rows = con.execute(_bpe_encode_sql(5)).fetchall()
    assert rows and list(rows[0][1]) == _ref_encode(texts[0], merges)


def test_oracle_survives_merge_exhaustion():
    # fewer possible merges than n_merges: b{t} goes empty and v{t} must
    # FALL BACK to v{t-1}, not cross-join itself into an empty vocabulary
    # (the round-3 review finding: encode/vocab oracles returned 0 rows)
    con = _docs_con(["a"])
    rows = con.execute(_bpe_encode_sql(3)).fetchall()
    assert rows == [(0, ["a</w>"], 1)]
    merges = con.execute(_bpe_learn_sql(3)).fetchall()
    assert [(r[1], r[2]) for r in merges] == [("a", "</w>")]


def _ref_pack(texts, sources, merges, seq_len):
    # reference packing: per-source doc-order token concat, cut every
    # seq_len tokens crossing doc boundaries
    from collections import defaultdict

    streams = defaultdict(list)
    for i, t in enumerate(texts):
        toks = _ref_encode(t, merges)
        if toks:
            streams[sources[i]].append((i, toks))
    out = {}
    for src, docs in streams.items():
        flat = [tok for _, toks in sorted(docs) for tok in toks]
        for s in range(0, len(flat), seq_len):
            seq = flat[s : s + seq_len]
            out[(src, s // seq_len)] = (seq, len(seq))
    return out


@settings(max_examples=20, deadline=None)
@given(
    texts=corpus,
    n_merges=st.integers(min_value=1, max_value=4),
    seq_len=st.integers(min_value=2, max_value=7),
)
def test_pack_tokens_oracle_matches_reference(texts, n_merges, seq_len):
    from fourmc_spark.queries import _pack_tokens_sql

    sources = [f"s{i % 2}" for i in range(len(texts))]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, '{t}', '{sources[i]}')" for i, t in enumerate(texts)
        )
        + ") t(doc_id, text, source)"
    )
    merges = _ref_learn(texts, n_merges)
    rows = con.execute(_pack_tokens_sql(n_merges, seq_len)).fetchall()
    got = {(r[0], int(r[1])): (list(r[3]), int(r[2])) for r in rows}
    assert got == _ref_pack(texts, sources, merges, seq_len)
