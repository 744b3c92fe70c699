"""Terminal results browser — the interactive-browse slice of the
reference TUI (``ck-tui/src``: query box, ranked result list, preview
pane, history — ``state.rs:11-38`` is the state contract this mirrors)
rebuilt minimal: one curses screen over one open ``BM25Engine``.

    python -m ck_ray.tui --index-dir IDX [--corpus PARQUET] [--query Q]

Keys:

    type / backspace      edit the query
    Enter                 run the search (BM25 top-k)
    Tab                   cycle mode: bm25 -> regex -> hybrid
    Up / Down             move the result selection
    PgUp / PgDn           scroll the preview
    Ctrl-F                toggle snippet vs full-file preview
    Ctrl-P / Ctrl-N       walk the query history
    Ctrl-S                refresh index stats in the header
    Esc / Ctrl-C / Ctrl-Q quit

Design: ALL behavior lives in pure functions over ``TuiState`` plus a
minimal ``Screen`` protocol (``size() -> (h, w)``; ``put(y, x, text,
bold=False)``), so the whole browser is unit-testable with a fake
screen and a real engine — the curses layer (``run_tui``) is only key
decoding + refresh. Searches reuse the engine verbatim (sticky shard
routing keeps caches warm across keystrokes, the way the reference TUI
holds its searcher); full-file preview fetches through the same
``parquet_field_source`` seam the sampled significant_text collector
uses, so no corpus bytes are resident until a file is opened.
"""

from __future__ import annotations

import argparse
import sys
from dataclasses import dataclass, field

MODES = ("bm25", "regex", "hybrid")


@dataclass
class TuiState:
    query: str = ""
    mode: str = "bm25"
    results: list = field(default_factory=list)  # [{path, score, doc_id, preview}]
    selected_idx: int = 0
    preview_lines: list = field(default_factory=list)
    preview_offset: int = 0
    full_file: bool = False
    status: str = "type a query, Enter to search"
    history: list = field(default_factory=list)
    history_idx: int = 0  # == len(history) when editing a fresh query
    top_k: int = 20
    stats_line: str = ""


class EngineSession:
    """The one stateful thing: an open engine + optional corpus source.

    Kept separate from ``TuiState`` so state transitions stay pure and
    the session can be closed deterministically (tests, __exit__)."""

    def __init__(self, index_dir: str, corpus: str | None = None):
        from .query import BM25Engine, parquet_field_source

        self.engine = BM25Engine(index_dir, num_shards=4)
        self.corpus = corpus
        self._fetch = (
            parquet_field_source(corpus, "path", "content")
            if corpus
            else None
        )

    def close(self) -> None:
        self.engine.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---- queries ------------------------------------------------------
    def search(self, query: str, mode: str, top_k: int) -> list[dict]:
        if mode == "regex":
            return self._regex(query, top_k)
        if mode == "hybrid":
            return self._hybrid(query, top_k)
        df = self.engine.search(query, top_k=top_k, with_metadata=True)
        return [
            {
                "path": r.path,
                "score": float(r.normalized_score),
                "doc_id": int(r.doc_id),
                "preview": getattr(r, "preview", "") or "",
            }
            for r in df.itertuples(index=False)
        ]

    def _regex(self, pattern: str, top_k: int) -> list[dict]:
        if not self.corpus:
            raise ValueError("regex mode needs --corpus")
        from .regex_search import regex_search

        df = regex_search(self.corpus, pattern)
        out = []
        for path, g in df.groupby("path", sort=True):
            first = g.iloc[0]
            out.append(
                {
                    "path": path,
                    "score": float(len(g)),  # match count, not BM25
                    "doc_id": -1,
                    "preview": str(first.get("line", ""))[:200],
                }
            )
            if len(out) >= top_k:
                break
        return out

    def _hybrid(self, query: str, top_k: int) -> list[dict]:
        """RRF fusion of the BM25 leg and the regex leg (terms joined
        with ``.*`` in token order) — the REPL's /hybrid, browseable."""
        lex = self.search(query, "bm25", top_k * 2)
        try:
            pat = ".*".join(t for t in query.split() if t)
            rex = self._regex(pat, top_k * 2)
        except Exception:
            # no corpus, or the tokens form an invalid regex (raised
            # as Arrow/Ray errors, not ValueError) — degrade to the
            # lexical leg alone rather than failing the whole search
            rex = []
        rank = {}
        for i, r in enumerate(lex):
            rank.setdefault(r["path"], dict(r))["lex"] = i + 1
        for i, r in enumerate(rex):
            rank.setdefault(r["path"], dict(r))["rex"] = i + 1
        fused = []
        for r in rank.values():
            s = sum(
                1.0 / (60 + r[k]) for k in ("lex", "rex") if k in r
            )
            fused.append({**r, "score": s})
        fused.sort(key=lambda r: (-r["score"], r["path"]))
        return fused[:top_k]

    def full_text(self, path: str) -> str | None:
        if self._fetch is None:
            return None
        return self._fetch([path]).get(path)

    def stats_line(self) -> str:
        m = self.engine.manifest
        return (
            f"{m['num_docs']:,} docs | {m.get('num_parts', '?')} parts "
            f"| epoch {len(m.get('epochs', [1]))}"
        )


# ---- pure state transitions ----------------------------------------------


def run_search(state: TuiState, sess: EngineSession) -> TuiState:
    q = state.query.strip()
    if not q:
        state.status = "empty query"
        return state
    try:
        state.results = sess.search(q, state.mode, state.top_k)
        state.status = f"{len(state.results)} hits [{state.mode}]"
    except Exception as e:  # parse errors etc. -> status bar, not crash
        state.results = []
        state.status = f"error: {e}"[:120]
    state.selected_idx = 0
    state.preview_offset = 0
    if q and (not state.history or state.history[-1] != q):
        state.history.append(q)
    state.history_idx = len(state.history)
    load_preview(state, sess)
    return state


def load_preview(state: TuiState, sess: EngineSession) -> TuiState:
    state.preview_lines = []
    state.preview_offset = 0
    if not state.results:
        return state
    r = state.results[state.selected_idx]
    text = sess.full_text(r["path"]) if state.full_file else None
    if text is None:  # stored 3-line snippet (always index-resident)
        text = r.get("preview", "")
        if state.full_file:
            state.status = "(no --corpus: stored snippet only)"
    state.preview_lines = text.splitlines() or ["(empty)"]
    return state


def move_selection(
    state: TuiState, delta: int, sess: EngineSession
) -> TuiState:
    if not state.results:
        return state
    state.selected_idx = max(
        0, min(len(state.results) - 1, state.selected_idx + delta)
    )
    return load_preview(state, sess)


def scroll_preview(state: TuiState, delta: int, page: int) -> TuiState:
    top = max(0, len(state.preview_lines) - 1)
    state.preview_offset = max(
        0, min(top, state.preview_offset + delta * page)
    )
    return state


def toggle_full_file(state: TuiState, sess: EngineSession) -> TuiState:
    state.full_file = not state.full_file
    return load_preview(state, sess)


def cycle_mode(state: TuiState) -> TuiState:
    state.mode = MODES[(MODES.index(state.mode) + 1) % len(MODES)]
    state.status = f"mode: {state.mode}"
    return state


def history_step(state: TuiState, delta: int) -> TuiState:
    if not state.history:
        return state
    state.history_idx = max(
        0, min(len(state.history), state.history_idx + delta)
    )
    state.query = (
        state.history[state.history_idx]
        if state.history_idx < len(state.history)
        else ""
    )
    return state


# ---- rendering (screen protocol: size() + put()) -------------------------


def render(state: TuiState, scr) -> None:
    h, w = scr.size()
    if h < 4 or w < 10:
        scr.put(0, 0, "window too small")
        return
    scr.put(
        0, 0,
        f"[{state.mode}] > {state.query}"[: w - 1], bold=True,
    )
    if state.stats_line:
        tail = state.stats_line[: w - 1]
        scr.put(0, max(0, w - 1 - len(tail)), tail)
    body = h - 3  # header + status + 1-based safety
    res_h = max(1, body // 2)
    # keep the selection visible: scroll the result window so the
    # selected row is always inside the pane
    top = max(0, min(state.selected_idx - res_h + 1,
                     len(state.results) - res_h))
    for i in range(res_h):
        j = top + i
        if j >= len(state.results):
            break
        r = state.results[j]
        mark = ">" if j == state.selected_idx else " "
        line = f"{mark} {r['score']:8.4f}  {r['path']}"
        scr.put(1 + i, 0, line[: w - 1], bold=j == state.selected_idx)
    pv_top = 1 + res_h
    scr.put(pv_top, 0, "-" * (w - 1))
    pv_h = body - res_h - 1
    for i in range(max(0, pv_h)):
        j = state.preview_offset + i
        if j >= len(state.preview_lines):
            break
        scr.put(pv_top + 1 + i, 0, state.preview_lines[j][: w - 1])
    scr.put(h - 1, 0, state.status[: w - 1])


# ---- key handling --------------------------------------------------------

KEY_ENTER, KEY_TAB, KEY_ESC = 10, 9, 27
KEY_ENTER_ALL = (10, 13, 343)  # \n, \r (raw mode), curses KEY_ENTER
KEY_BACKSPACE = (8, 127, 263)  # ^H, DEL, curses KEY_BACKSPACE
KEY_UP, KEY_DOWN, KEY_PGUP, KEY_PGDN = 259, 258, 339, 338
CTRL = {c: ord(c.lower()) - 96 for c in "CFNPQS"}


def handle_key(state: TuiState, key: int, sess: EngineSession) -> bool:
    """Apply one key; returns True when the browser should exit."""
    if key in (KEY_ESC, CTRL["C"], CTRL["Q"]):
        return True
    if key in KEY_ENTER_ALL:
        run_search(state, sess)
    elif key == KEY_TAB:
        cycle_mode(state)
    elif key in KEY_BACKSPACE:
        state.query = state.query[:-1]
    elif key == KEY_UP:
        move_selection(state, -1, sess)
    elif key == KEY_DOWN:
        move_selection(state, +1, sess)
    elif key == KEY_PGUP:
        scroll_preview(state, -1, 10)
    elif key == KEY_PGDN:
        scroll_preview(state, +1, 10)
    elif key == CTRL["F"]:
        toggle_full_file(state, sess)
    elif key == CTRL["P"]:
        history_step(state, -1)
    elif key == CTRL["N"]:
        history_step(state, +1)
    elif key == CTRL["S"]:
        state.stats_line = sess.stats_line()
    elif 32 <= key < 127:
        state.query += chr(key)
        state.history_idx = len(state.history)
    return False


# ---- curses shell --------------------------------------------------------


class _CursesScreen:
    def __init__(self, win):
        self.win = win

    def size(self):
        return self.win.getmaxyx()

    def put(self, y, x, text, bold=False):
        import curses

        try:
            self.win.addstr(y, x, text, curses.A_BOLD if bold else 0)
        except curses.error:
            pass  # writes clipped at the bottom-right cell


def run_tui(
    index_dir: str, corpus: str | None = None,
    initial_query: str | None = None,
) -> None:
    import curses

    sess = EngineSession(index_dir, corpus)
    state = TuiState()
    state.stats_line = sess.stats_line()
    if initial_query:
        state.query = initial_query
        run_search(state, sess)

    def loop(win):
        curses.curs_set(0)
        win.keypad(True)
        while True:
            win.erase()
            render(state, _CursesScreen(win))
            win.refresh()
            if handle_key(state, win.getch(), sess):
                return

    try:
        curses.wrapper(loop)
    finally:
        sess.close()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m ck_ray.tui")
    p.add_argument("--index-dir", required=True)
    p.add_argument("--corpus", help="corpus parquet dir for full-file "
                   "preview + regex/hybrid modes")
    p.add_argument("--query", help="run this query on startup")
    args = p.parse_args(argv)
    import ray

    owned = not ray.is_initialized()
    if owned:
        ray.init(include_dashboard=False, logging_level="ERROR")
    try:
        run_tui(args.index_dir, args.corpus, args.query)
    finally:
        if owned:
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
