"""shodh-tpu terminal dashboard.

Reference: ``tui/`` (14k-LoC ratatui app: Dashboard/Projects/Activity/Graph
views, keyword/semantic/date search, todo CRUD with comments + subtasks,
dark/light themes, help overlay). Same surface here, layered for
testability: ``data.py`` (engine adapter) → ``state.py`` (pure key-driven
state machine) → ``render.py`` (pure styled-row renderer) → ``shell.py``
(the only curses code).

Run: ``python -m shodh_tpu.clients.tui [--data-dir DIR] [--user U]``
"""

from .data import EngineData
from .render import render
from .state import App

__all__ = ["App", "EngineData", "render", "main"]


def main() -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default="~/.shodh-tpu")
    p.add_argument("--user", default="default")
    args = p.parse_args()
    data = EngineData(args.data_dir, args.user)
    app = App(data)
    try:
        from .shell import run

        run(app)
    finally:
        data.close()


if __name__ == "__main__":
    main()
