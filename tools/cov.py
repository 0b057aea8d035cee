"""First-party line-coverage tool on sys.monitoring (PEP 669).

The environment bans third-party installs (no coverage.py / pytest-cov),
so this implements the same disable-after-first-hit technique coverage.py
7.x uses: a LINE callback records (file, line) once and returns
``sys.monitoring.DISABLE`` for that code location, making steady-state
overhead near zero.

Executable-line universe: every line that appears in ``co_lines()`` of
any code object reachable from a module compiled from source — the same
definition coverage.py uses (so percentages are comparable with the
reference's 58.57%, /root/reference/coverage.xml:2).

Usage (standalone):
    python tools/cov.py -m pytest tests/ -q
or via the pytest hook in tests/conftest.py:
    GUIDEMAKER_COV=1 python -m pytest tests/ -q
Writes ``coverage_guidemaker.json`` + a per-file table on exit.
"""
from __future__ import annotations

import json
import os
import sys

TOOL_ID = 4                      # sys.monitoring tool slot (0-5 free-form)
_executed: set = set()
_started = False


def _on_line(code, line):
    fname = code.co_filename
    if "guidemaker_tpu" in fname and "/tests/" not in fname:
        _executed.add((fname, line))
    return sys.monitoring.DISABLE


def start() -> None:
    """Begin recording line execution for guidemaker_tpu sources."""
    global _started
    if _started:
        return
    mon = sys.monitoring
    mon.use_tool_id(TOOL_ID, "guidemaker-cov")
    mon.register_callback(TOOL_ID, mon.events.LINE, _on_line)
    mon.set_events(TOOL_ID, mon.events.LINE)
    _started = True


def _executable_lines(path: str) -> set:
    """All executable lines of a source file via compiled co_lines()."""
    with open(path, "rb") as fh:
        try:
            top = compile(fh.read(), path, "exec")
        except SyntaxError:
            return set()
    lines, stack = set(), [top]
    while stack:
        code = stack.pop()
        for _, _, ln in code.co_lines():
            if ln is not None and ln > 0:
                lines.add(ln)
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    return lines


def report(pkg_dir: str = None, out_json: str = "coverage_guidemaker.json",
           stream=None) -> float:
    """Write the per-file coverage table; returns total percent."""
    stream = stream or sys.stderr
    if pkg_dir is None:
        pkg_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "guidemaker_tpu")
    hit_by_file = {}
    for fname, line in _executed:
        hit_by_file.setdefault(os.path.abspath(fname), set()).add(line)

    rows, tot_exec, tot_hit = [], 0, 0
    for root, _dirs, files in os.walk(pkg_dir):
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            path = os.path.abspath(os.path.join(root, f))
            execu = _executable_lines(path)
            if not execu:
                continue
            hit = hit_by_file.get(path, set()) & execu
            rows.append((os.path.relpath(path, os.path.dirname(pkg_dir)),
                         len(execu), len(hit)))
            tot_exec += len(execu)
            tot_hit += len(hit)

    pct = 100.0 * tot_hit / max(tot_exec, 1)
    print(f"\n{'file':52s} {'lines':>6s} {'hit':>6s} {'cov%':>6s}",
          file=stream)
    for name, ne, nh in rows:
        print(f"{name:52s} {ne:6d} {nh:6d} {100.0*nh/ne:6.1f}", file=stream)
    print(f"{'TOTAL':52s} {tot_exec:6d} {tot_hit:6d} {pct:6.2f}",
          file=stream)
    with open(out_json, "w") as fh:
        json.dump({"total_percent": round(pct, 2),
                   "lines": tot_exec, "hit": tot_hit,
                   "files": {n: {"lines": ne, "hit": nh}
                             for n, ne, nh in rows}}, fh, indent=1)
    print(f"coverage written to {out_json}", file=stream)
    return pct


def main():  # standalone runner: python tools/cov.py -m pytest ...
    import runpy
    start()
    argv = sys.argv[1:]
    try:
        if argv and argv[0] == "-m":
            sys.argv = argv[1:]
            runpy.run_module(argv[1], run_name="__main__")
        else:
            sys.argv = argv
            runpy.run_path(argv[0], run_name="__main__")
    except SystemExit:
        pass
    finally:
        report()


if __name__ == "__main__":
    main()
