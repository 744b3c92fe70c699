"""Code-aware tokenizer reproducing tantivy's "default" analyzer semantics.

The reference indexes ``content`` and ``path`` fields with tantivy 0.24's
default analyzer (schema at reference ``ck-engine/src/lib.rs:750-753``):

    SimpleTokenizer            split on every non-alphanumeric char
                               (Unicode categories L* and N*)
    RemoveLongFilter::limit(40) drop tokens whose UTF-8 byte length >= 40
                               (applied BEFORE lowercasing; positions are
                               assigned by the tokenizer and NOT renumbered
                               when a long token is dropped)
    LowerCaser                 unicode lowercase

Consequences this module must preserve exactly (SURVEY.md §2.2):
``snake_case`` -> ``snake``, ``case``; ``camelCase`` -> ``camelcase``;
``foo.bar/baz.py`` -> ``foo``, ``bar``, ``baz``, ``py``; 40+-byte tokens
vanish but leave a position gap.

Implementation: a single vectorized pass over a ``pyarrow`` string array
(``split_pattern_regex`` with RE2 ``[^\\p{L}\\p{N}]+`` — the same character
classes as Rust's ``char::is_alphanumeric``). The pure-string helper
``tokenize_text`` wraps the same kernel so the test oracle and the engine
share one tokenization definition by construction.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SPLIT_PATTERN = r"[^\p{L}\p{N}]+"
MAX_TOKEN_BYTES = 40  # tokens with byte length >= 40 are dropped


@dataclass
class TokenizedBatch:
    """Flat token stream for a batch of documents.

    ``row_index[i]`` is the batch-local row the i-th token came from;
    ``position[i]`` is the tantivy token position (pre-drop ordinal within
    the row); ``term`` is the lowercased token text. ``doc_len[r]`` is the
    number of *kept* tokens of row r (== the field length BM25 uses).
    """

    row_index: np.ndarray  # int64, len = n_tokens
    position: np.ndarray  # int32, len = n_tokens
    term: pa.Array  # string, len = n_tokens
    doc_len: np.ndarray  # int32, len = n_rows


def tokenize_array(arr: pa.Array | pa.ChunkedArray) -> TokenizedBatch:
    """Tokenize a string array; fully vectorized (no per-row Python)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n_rows = len(arr)
    # Nulls tokenize to nothing.
    arr = arr.fill_null("")
    lists = pc.split_pattern_regex(arr, pattern=SPLIT_PATTERN)
    vals = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    offsets = lists.offsets.to_numpy(zero_copy_only=False)
    counts = np.diff(offsets)
    # Pre-drop ordinal position of each raw token within its row. Empty
    # strings produced by leading/trailing separators are artifacts of the
    # split (SimpleTokenizer never emits empty tokens) so they must NOT
    # consume positions: number only the non-empty tokens.
    byte_len = pc.binary_length(vals).to_numpy(zero_copy_only=False)
    nonempty = byte_len > 0
    if len(parents) == 0:
        return TokenizedBatch(
            row_index=np.empty(0, np.int64),
            position=np.empty(0, np.int32),
            term=pa.array([], type=pa.string()),
            doc_len=np.zeros(n_rows, np.int32),
        )
    # ordinal among non-empty tokens of the same row
    ne_cum = np.cumsum(nonempty)
    row_start_ne = np.concatenate(([0], ne_cum))[offsets[:-1]]
    position = (ne_cum - 1 - np.repeat(row_start_ne, counts)).astype(np.int32)

    keep = nonempty & (byte_len < MAX_TOKEN_BYTES)
    keep_idx = np.nonzero(keep)[0]
    kept_vals = pc.utf8_lower(vals.take(pa.array(keep_idx)))
    row_index = parents[keep_idx]
    doc_len = np.bincount(row_index, minlength=n_rows).astype(np.int32)
    return TokenizedBatch(
        row_index=row_index.astype(np.int64),
        position=position[keep_idx],
        term=kept_vals,
        doc_len=doc_len,
    )


def tokenize_text(text: str) -> list[str]:
    """Tokenize one string (oracle / test helper); same kernel as batches."""
    tb = tokenize_array(pa.array([text], type=pa.string()))
    return tb.term.to_pylist()


def tokenize_text_with_positions(text: str) -> list[tuple[str, int]]:
    """(term, position) pairs for one string — positions keep drop gaps."""
    tb = tokenize_array(pa.array([text], type=pa.string()))
    return list(zip(tb.term.to_pylist(), tb.position.tolist()))


def term_frequencies(
    arr: pa.Array | pa.ChunkedArray, *, with_positions: bool = True
) -> tuple[pa.Table, np.ndarray]:
    """Per-(row, term) tf (and position lists) for a batch of documents.

    Returns ``(table, doc_len)`` where table has columns
    ``row`` (int64 batch-local), ``term`` (string), ``tf`` (int64) and,
    when ``with_positions``, ``positions`` (list<int32>, ascending).
    Grouping is a vectorized Arrow hash-groupby — no Python loop.
    """
    tb = tokenize_array(arr)
    t = pa.table(
        {
            "row": pa.array(tb.row_index, type=pa.int64()),
            "term": tb.term,
            "pos": pa.array(tb.position, type=pa.int32()),
        }
    )
    aggs = [("pos", "list"), ("pos", "count")] if with_positions else [("pos", "count")]
    g = pa.TableGroupBy(t, ["row", "term"], use_threads=False).aggregate(aggs)
    cols = {
        "row": g["row"],
        "term": g["term"],
        "tf": g["pos_count"],
    }
    if with_positions:
        cols["positions"] = g["pos_list"]
    return pa.table(cols), tb.doc_len
