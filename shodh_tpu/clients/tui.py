"""Terminal dashboard (curses) — memory stream, search, todos, stats.

Reference: ``tui/`` (ratatui, 14k LoC). This is the same surface in
compact form: a live dashboard over the embedded engine or a server.

Run: ``python -m shodh_tpu.clients.tui [--data-dir DIR]``
Keys: ``/`` search · ``t`` todos · ``m`` memories · ``s`` stats · ``q`` quit
"""

from __future__ import annotations

import curses
import textwrap
from datetime import datetime
from pathlib import Path


class Dashboard:
    def __init__(self, data_dir: str, user: str = "default"):
        from shodh_tpu.engine.memory_system import MemorySystem

        self.system = MemorySystem(Path(data_dir).expanduser() / user)
        self.mode = "memories"
        self.query = ""
        self.results: list[str] = []

    # -- data ---------------------------------------------------------------

    def memory_lines(self, limit: int) -> list[str]:
        mems = sorted(
            self.system.get_all(limit=200), key=lambda m: m.created_at, reverse=True
        )[:limit]
        return [
            f"{m.created_at.strftime('%m-%d %H:%M')} [{m.experience.experience_type.value:12s}] "
            f"i={m.importance:.2f} {m.experience.content[:90]}"
            for m in mems
        ]

    def todo_lines(self, limit: int) -> list[str]:
        if self.system.todos is None:
            return ["todos unavailable"]
        return [
            f"[{t.status:11s}] ({t.priority:6s}) {t.title[:80]}"
            for t in self.system.todos.list()[:limit]
        ] or ["no open todos"]

    def stats_lines(self) -> list[str]:
        st = self.system.stats().to_dict()
        lines = [f"{k}: {v}" for k, v in st.items()]
        if self.system.graph is not None:
            g = self.system.graph.stats()
            lines.append(f"graph: {g['entities']} entities, {g['edges']} edges "
                         f"(density {g['density']:.2f})")
            lines.append(f"edge tiers: {g['edge_tiers']}  ltp: {g['ltp']}")
        return lines

    def search_lines(self, limit: int) -> list[str]:
        if not self.query:
            return ["press / and type a query"]
        from shodh_tpu.types import Query

        res = self.system.recall(Query(query_text=self.query, max_results=limit))
        return [
            f"{sm.score:7.3f}  {sm.memory.experience.content[:90]}" for sm in res.memories
        ] or ["no results"]

    # -- UI -----------------------------------------------------------------

    def run(self, stdscr) -> None:
        curses.curs_set(0)
        stdscr.timeout(500)
        while True:
            stdscr.erase()
            h, w = stdscr.getmaxyx()
            title = f" shodh-tpu · {self.mode} · {datetime.now().strftime('%H:%M:%S')} "
            stdscr.addnstr(0, 0, title.center(w, "─"), w - 1, curses.A_BOLD)
            if self.mode == "memories":
                lines = self.memory_lines(h - 4)
            elif self.mode == "todos":
                lines = self.todo_lines(h - 4)
            elif self.mode == "stats":
                lines = self.stats_lines()
            else:
                lines = self.search_lines(h - 4)
            row = 2
            for line in lines:
                if row >= h - 2:
                    break
                for wrapped in textwrap.wrap(line, w - 2)[:2]:
                    if row >= h - 2:
                        break
                    stdscr.addnstr(row, 1, wrapped, w - 2)
                    row += 1
            footer = " / search · m memories · t todos · s stats · q quit "
            stdscr.addnstr(h - 1, 0, footer[: w - 1], w - 1, curses.A_REVERSE)
            stdscr.refresh()
            try:
                ch = stdscr.getch()
            except KeyboardInterrupt:
                break
            if ch == ord("q"):
                break
            if ch == ord("m"):
                self.mode = "memories"
            elif ch == ord("t"):
                self.mode = "todos"
            elif ch == ord("s"):
                self.mode = "stats"
            elif ch == ord("/"):
                curses.echo()
                curses.curs_set(1)
                stdscr.addnstr(h - 1, 0, "query: " + " " * (w - 9), w - 1)
                stdscr.move(h - 1, 7)
                self.query = stdscr.getstr(h - 1, 7, 200).decode("utf-8", "replace")
                curses.noecho()
                curses.curs_set(0)
                self.mode = "search"

    def close(self) -> None:
        self.system.close()


def main() -> None:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", default="~/.shodh-tpu")
    p.add_argument("--user", default="default")
    args = p.parse_args()
    dash = Dashboard(args.data_dir, args.user)
    try:
        curses.wrapper(dash.run)
    finally:
        dash.close()


if __name__ == "__main__":
    main()
