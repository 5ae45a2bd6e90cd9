"""TUI data-model tests (reference: tui/ ratatui dashboard widgets) — the
render loop is curses, but every line-producing method is pure data and
testable headless."""

import pytest

from shodh_tpu.clients.tui import Dashboard
from shodh_tpu.types import Experience, ExperienceType
from shodh_tpu.utils.clock import scoring_now


@pytest.fixture()
def dash(tmp_path):
    d = Dashboard(str(tmp_path), user="tui-tester")
    d.system.remember(Experience(content="tui smoke memory about terminals", tags=["tui"]))
    d.system.remember(
        Experience(content="decision: render with curses not ratatui",
                   experience_type=ExperienceType.DECISION)
    )
    d.system.todos.add("wire the tui tests", scoring_now(), priority="high")
    yield d
    d.close()


def test_memory_lines_newest_first(dash):
    lines = dash.memory_lines(limit=10)
    assert len(lines) == 2
    assert "decision" in lines[0]  # stored second -> listed first
    assert all("i=" in l for l in lines)


def test_todo_and_stats_lines(dash):
    todos = dash.todo_lines(limit=5)
    assert any("wire the tui tests" in l for l in todos)
    stats = dash.stats_lines()
    assert any("total_memories" in l for l in stats)
    assert any(l.startswith("graph:") for l in stats)


def test_search_lines(dash):
    assert dash.search_lines(5) == ["press / and type a query"]
    dash.query = "curses render decision"
    lines = dash.search_lines(5)
    assert lines and "curses" in lines[0]


def test_empty_dashboard(tmp_path):
    d = Dashboard(str(tmp_path / "fresh"))
    assert d.memory_lines(5) == []
    assert d.todo_lines(5) == ["no open todos"]
    d.close()
