"""Terminal results browser: the whole state machine and renderer run
against a REAL engine over the tiny index, driven through a fake screen
(the ``Screen`` protocol) — no tty, no curses initialization. The
curses layer itself is only key decoding + refresh and stays untested
(environment has no terminal)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ck_ray.tui import (
    CTRL,
    KEY_DOWN,
    KEY_ENTER,
    KEY_PGDN,
    KEY_TAB,
    KEY_UP,
    EngineSession,
    TuiState,
    cycle_mode,
    handle_key,
    history_step,
    render,
    run_search,
)


class FakeScreen:
    def __init__(self, h=24, w=80):
        self.h, self.w = h, w
        self.cells = {}

    def size(self):
        return (self.h, self.w)

    def put(self, y, x, text, bold=False):
        self.cells[(y, x)] = (text, bold)

    def text(self):
        return "\n".join(
            t for (_, _), (t, _) in sorted(self.cells.items())
        )


@pytest.fixture(scope="module")
def corpus_dir(tiny_corpus, tmp_path_factory):
    d = tmp_path_factory.mktemp("tui_corpus")
    pq.write_table(tiny_corpus, str(d / "part-0.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def sess(ray_session, tiny_index, corpus_dir):
    s = EngineSession(tiny_index, corpus=corpus_dir)
    yield s
    s.close()


def _type(state, sess, text):
    for ch in text:
        assert not handle_key(state, ord(ch), sess)


def test_search_select_preview(sess):
    st = TuiState()
    _type(st, sess, "merge")
    assert st.query == "merge"
    handle_key(st, KEY_ENTER, sess)
    assert st.results and st.status.endswith("[bm25]")
    assert st.selected_idx == 0
    first_preview = list(st.preview_lines)
    assert first_preview  # stored snippet loads with the selection
    # selection moves and the preview follows the selected doc
    handle_key(st, KEY_DOWN, sess)
    assert st.selected_idx == 1
    handle_key(st, KEY_UP, sess)
    assert st.selected_idx == 0
    assert st.preview_lines == first_preview
    # clamped at both ends
    for _ in range(len(st.results) + 5):
        handle_key(st, KEY_DOWN, sess)
    assert st.selected_idx == len(st.results) - 1
    # scores are normalized (rank 1 == 1.0) and descending
    scores = [r["score"] for r in st.results]
    assert scores[0] == 1.0 and scores == sorted(scores, reverse=True)


def test_full_file_toggle_and_scroll(sess):
    st = TuiState()
    st.query = "merge"
    run_search(st, sess)
    snippet_len = len(st.preview_lines)
    handle_key(st, CTRL["F"], sess)  # full file via the corpus source
    assert st.full_file and len(st.preview_lines) >= snippet_len
    # the full text really is the corpus row for the selected path
    path = st.results[st.selected_idx]["path"]
    assert st.preview_lines == sess.full_text(path).splitlines()
    handle_key(st, KEY_PGDN, sess)
    assert st.preview_offset == 10
    handle_key(st, CTRL["F"], sess)
    assert not st.full_file and st.preview_offset == 0


def test_mode_cycle_regex_and_hybrid(sess):
    st = TuiState()
    st.query = "merge"
    handle_key(st, KEY_TAB, sess)
    assert st.mode == "regex"
    run_search(st, sess)
    assert st.results  # per-file match counts
    assert all(r["doc_id"] == -1 for r in st.results)
    cycle_mode(st)
    assert st.mode == "hybrid"
    run_search(st, sess)
    assert st.results
    hybrid_paths = {r["path"] for r in st.results}
    cycle_mode(st)
    assert st.mode == "bm25"
    run_search(st, sess)
    # fusion keeps lexical hits in the browse set
    assert hybrid_paths & {r["path"] for r in st.results}


def test_history_walk(sess):
    st = TuiState()
    for q in ("merge", "stream", "window"):
        st.query = q
        run_search(st, sess)
    handle_key(st, CTRL["P"], sess)
    assert st.query == "window"
    handle_key(st, CTRL["P"], sess)
    assert st.query == "stream"
    handle_key(st, CTRL["N"], sess)
    assert st.query == "window"
    handle_key(st, CTRL["N"], sess)
    assert st.query == ""  # back to the fresh-edit slot
    history_step(st, -3)
    assert st.query == "merge"  # clamped at the oldest entry


def test_query_error_goes_to_status_not_crash(sess):
    st = TuiState()
    st.query = "/[/"  # invalid regex term -> engine raises
    run_search(st, sess)
    assert st.results == [] and st.status.startswith("error:")


def test_render_layout(sess):
    st = TuiState()
    st.stats_line = sess.stats_line()
    st.query = "merge"
    run_search(st, sess)
    scr = FakeScreen(h=24, w=100)
    render(st, scr)
    txt = scr.text()
    assert "[bm25] > merge" in txt
    assert st.results[0]["path"] in txt
    assert "docs" in txt  # stats in the header
    assert st.status in txt  # status bar
    header, _ = scr.cells[(0, 0)]
    assert header.startswith("[bm25]")
    # selected row renders bold with the > marker
    sel_rows = [
        (t, b) for (y, x), (t, b) in scr.cells.items()
        if y == 1 and x == 0
    ]
    assert sel_rows and sel_rows[0][0].startswith(">") and sel_rows[0][1]
    # tiny screens degrade gracefully
    small = FakeScreen(h=2, w=8)
    render(st, small)
    assert "small" in small.text()


def test_exit_keys(sess):
    st = TuiState()
    for key in (27, CTRL["C"], CTRL["Q"]):
        assert handle_key(st, key, sess) is True


def test_result_list_scrolls_with_selection(sess):
    """Review fix: the selected row stays visible (with its > marker)
    even when the selection moves past the pane height."""
    from ck_ray.tui import KEY_DOWN

    st = TuiState()
    st.query = "merge"
    run_search(st, sess)
    assert len(st.results) > 8
    for _ in range(len(st.results) - 1):
        handle_key(st, KEY_DOWN, sess)
    scr = FakeScreen(h=12, w=80)  # small pane: res_h = 4
    render(st, scr)
    marked = [
        t for (_, _), (t, _) in scr.cells.items() if t.startswith(">")
    ]
    assert len(marked) == 1
    assert st.results[st.selected_idx]["path"] in marked[0]
