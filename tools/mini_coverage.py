"""Line coverage for the test suite without coverage.py (not in this image).

Uses CPython 3.12's sys.monitoring with per-line DISABLE after first hit —
the same low-overhead technique coverage.py 7 uses — so the full suite runs
at near-native speed. Fills the role the reference's cargo-llvm-cov →
SonarCloud pipeline plays in its CI (reference .github/workflows/ci.yml:42-62)
within this environment's constraints.

Usage:
    python tools/mini_coverage.py [--json OUT.json] [--min-pct N] \
        -- -m pytest tests/ -q

Everything after `--` is passed to a fresh `python` invocation semantics:
`-m module args...` or `script.py args...`. Reports per-module hit/executable
lines for wav2vec2_tpu/ and exits non-zero if total coverage < --min-pct.
"""

from __future__ import annotations

import argparse
import json
import runpy
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "wav2vec2_tpu"

_hits: dict[str, set[int]] = {}
TOOL = 3  # sys.monitoring tool id (coverage tools use 1..5 freely)


def _in_pkg(path: str) -> bool:
    return path.startswith(str(PKG))


def _install() -> None:
    mon = sys.monitoring
    mon.use_tool_id(TOOL, "mini_coverage")

    def on_start(code, _off):
        # only instrument package code; DISABLE keeps foreign code free
        if not _in_pkg(code.co_filename):
            return mon.DISABLE
        return None

    def on_line(code, line):
        f = code.co_filename
        if not _in_pkg(f):
            return mon.DISABLE
        _hits.setdefault(f, set()).add(line)
        return mon.DISABLE  # one event per line per code object

    mon.register_callback(TOOL, mon.events.PY_START, on_start)
    mon.register_callback(TOOL, mon.events.LINE, on_line)
    mon.set_events(TOOL, mon.events.PY_START | mon.events.LINE)


def _executable_lines(path: Path) -> set[int]:
    """All line numbers carrying bytecode, from the compiled module's code
    objects (matches what the LINE event can ever report)."""
    try:
        code = compile(path.read_text(), str(path), "exec")
    except SyntaxError:
        return set()
    lines: set[int] = set()
    stack = [code]
    while stack:
        c = stack.pop()
        for _, _, line in c.co_lines():
            if line is not None and line > 0:
                lines.add(line)
        for const in c.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
    return lines


def _fold_ranges(lines: list[int]) -> str:
    """[3,4,5,9] → '3-5,9'."""
    out, i = [], 0
    while i < len(lines):
        j = i
        while j + 1 < len(lines) and lines[j + 1] == lines[j] + 1:
            j += 1
        out.append(str(lines[i]) if i == j else f"{lines[i]}-{lines[j]}")
        i = j + 1
    return ",".join(out)


def _report(json_out: str | None, min_pct: float,
            show_missing: str | None) -> int:
    rows = []
    tot_hit = tot_exec = 0
    for path in sorted(PKG.rglob("*.py")):
        ex = _executable_lines(path)
        if not ex:
            continue
        hit = _hits.get(str(path), set()) & ex
        rel = str(path.relative_to(REPO))
        rows.append((rel, len(hit), len(ex)))
        tot_hit += len(hit)
        tot_exec += len(ex)
        if show_missing and show_missing in rel:
            missing = sorted(ex - hit)
            print(f"missing in {rel}: {_fold_ranges(missing)}",
                  file=sys.stderr)
    rows.sort(key=lambda r: r[1] / r[2])
    print(f"\n{'file':57s} {'cov':>6s}  lines", file=sys.stderr)
    for name, h, e in rows:
        print(f"{name:57s} {100 * h / e:5.1f}%  {h}/{e}", file=sys.stderr)
    pct = 100 * tot_hit / max(tot_exec, 1)
    print(f"{'TOTAL':57s} {pct:5.1f}%  {tot_hit}/{tot_exec}", file=sys.stderr)
    if json_out:
        Path(json_out).write_text(json.dumps({
            "total_pct": round(pct, 2),
            "files": [
                {"file": n, "hit": h, "executable": e} for n, h, e in rows
            ],
        }, indent=1))
    return 0 if pct >= min_pct else 3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--min-pct", type=float, default=0.0)
    ap.add_argument("--show-missing", default=None, metavar="SUBSTR",
                    help="print uncovered line ranges for files whose path "
                         "contains SUBSTR")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- -m module args... | -- script.py args...")
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("nothing to run")

    _install()
    sys.argv = cmd[1:] if cmd[0] == "-m" else cmd
    code = 0
    try:
        if cmd[0] == "-m":
            sys.argv = cmd[1:]
            runpy.run_module(cmd[1], run_name="__main__", alter_sys=True)
        else:
            runpy.run_path(cmd[0], run_name="__main__")
    except SystemExit as e:
        code = int(e.code or 0)
    finally:
        sys.monitoring.set_events(TOOL, 0)
        sys.monitoring.free_tool_id(TOOL)
    rep = _report(args.json, args.min_pct, args.show_missing)
    return code or rep


if __name__ == "__main__":
    raise SystemExit(main())
