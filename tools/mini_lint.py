"""AST linter for this repo — the clippy `-D warnings` analog.

The reference gates every commit on `cargo fmt --check` + `cargo clippy
--all-targets -- -D warnings` (reference githooks/pre-commit:8-18 and
.github/workflows/ci.yml:27-34). This image ships no ruff/pyflakes/flake8
and installs are forbidden, so this tool implements the high-signal subset
natively on `ast`, warnings-as-errors (any finding ⇒ exit 1):

  L001 unused-import          binding never referenced in the module
  L002 unused-variable        local assigned but never read (conservative)
  L003 f-string-no-placeholder  f"" with no {…} fields
  L004 mutable-default-arg    list/dict/set literal as parameter default
  L005 bare-except            `except:` with no exception type
  L006 none-comparison        `== None` / `!= None` (use `is`)
  L007 duplicate-dict-key     repeated constant key in a dict literal

Deliberate scoping (kept conservative so the gate stays zero-noise):
  * `__init__.py` files are exempt from L001 — their imports are the
    package's re-export surface (ruff's conventional per-file F401 ignore).
  * L002 only fires on single-name `x = …` / `x: T = …` statements; loop
    variables, tuple unpacking, `with … as`, and `except … as` are never
    flagged, `_`-prefixed names are exempt, and any function that calls
    `locals()` / `eval()` / `exec()` / `vars()` is skipped entirely.
  * Names quoted inside annotation strings count as uses for L001 (so
    `x: "LazyType"` keeps a TYPE_CHECKING import alive).
  * `# noqa` anywhere on the flagged line suppresses it.

Usage:
    python tools/mini_lint.py [PATH ...]      # default: repo lint set
"""

from __future__ import annotations

import ast
import re
import sys
from dataclasses import dataclass
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

DEFAULT_PATHS = [
    "wav2vec2_tpu",
    "tests",
    "scripts",
    "examples",
    "tools",
    "bench.py",
    "__graft_entry__.py",
    "setup.py",
]

_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")
_DYNAMIC_SCOPE_CALLS = {"locals", "eval", "exec", "vars"}


@dataclass
class Finding:
    path: Path
    line: int
    col: int
    code: str
    message: str

    def render(self) -> str:
        rel = self.path
        try:
            rel = self.path.relative_to(REPO)
        except ValueError:
            pass
        return f"{rel}:{self.line}:{self.col + 1} {self.code} {self.message}"


def _annotation_string_uses(tree: ast.AST) -> set[str]:
    """Identifiers inside quoted annotations ('LazyType' etc.) count as uses."""
    uses: set[str] = set()
    ann_nodes: list[ast.expr] = []
    for node in ast.walk(tree):
        if isinstance(node, ast.AnnAssign) and node.annotation is not None:
            ann_nodes.append(node.annotation)
        elif isinstance(node, ast.arg) and node.annotation is not None:
            ann_nodes.append(node.annotation)
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and node.returns:
            ann_nodes.append(node.returns)
    for ann in ann_nodes:
        for sub in ast.walk(ann):
            if isinstance(sub, ast.Constant) and isinstance(sub.value, str):
                uses.update(_IDENT.findall(sub.value))
    return uses


def _module_name_uses(tree: ast.AST) -> set[str]:
    uses: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(node.ctx, (ast.Load, ast.Del)):
            uses.add(node.id)
        elif isinstance(node, ast.Attribute):
            # attribute roots are Name loads, already collected by the walk
            pass
        elif isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name) and tgt.id == "__all__":
                    for sub in ast.walk(node.value):
                        if isinstance(sub, ast.Constant) and isinstance(sub.value, str):
                            uses.add(sub.value)
    return uses


def _check_imports(tree: ast.Module, path: Path, findings: list[Finding]) -> None:
    if path.name == "__init__.py":
        return
    uses = _module_name_uses(tree) | _annotation_string_uses(tree)
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                bound = alias.asname or alias.name.split(".")[0]
                redundant = alias.asname is not None and alias.asname == alias.name
                if bound not in uses and not redundant:
                    findings.append(
                        Finding(path, node.lineno, node.col_offset, "L001",
                                f"unused import `{alias.asname or alias.name}`")
                    )
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for alias in node.names:
                if alias.name == "*":
                    continue
                bound = alias.asname or alias.name
                redundant = alias.asname is not None and alias.asname == alias.name
                if bound not in uses and not redundant:
                    findings.append(
                        Finding(path, node.lineno, node.col_offset, "L001",
                                f"unused import `{bound}` from `{node.module}`")
                    )


def _check_unused_locals(tree: ast.Module, path: Path, findings: list[Finding]) -> None:
    for fn in ast.walk(tree):
        if not isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        calls_dynamic = any(
            isinstance(n, ast.Call)
            and isinstance(n.func, ast.Name)
            and n.func.id in _DYNAMIC_SCOPE_CALLS
            for n in ast.walk(fn)
        )
        if calls_dynamic:
            continue
        declared_elsewhere: set[str] = set()
        loads: set[str] = set()
        stores: dict[str, ast.Name] = {}
        for n in ast.walk(fn):
            if isinstance(n, (ast.Global, ast.Nonlocal)):
                declared_elsewhere.update(n.names)
            elif isinstance(n, (ast.Import, ast.ImportFrom)):
                for alias in n.names:
                    declared_elsewhere.add(alias.asname or alias.name.split(".")[0])
            elif isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)) and n is not fn:
                declared_elsewhere.add(n.name)
            elif isinstance(n, ast.Name):
                if isinstance(n.ctx, (ast.Load, ast.Del)):
                    loads.add(n.id)
        def _own_scope_stmts(body: list[ast.stmt]) -> list[ast.stmt]:
            # Stores inside nested defs/classes belong to those scopes
            # (class attributes are not locals of the enclosing function).
            out: list[ast.stmt] = []
            for stmt in body:
                if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                    continue
                out.append(stmt)
                for field in ("body", "orelse", "finalbody", "handlers"):
                    children = getattr(stmt, field, None)
                    if children:
                        nested = [
                            c for h in children
                            for c in (h.body if isinstance(h, ast.ExceptHandler) else [h])
                        ] if field == "handlers" else list(children)
                        out.extend(_own_scope_stmts(nested))
            return out

        for n in _own_scope_stmts(fn.body):
            if isinstance(n, ast.Assign) and len(n.targets) == 1 and isinstance(n.targets[0], ast.Name):
                tgt = n.targets[0]
            elif isinstance(n, ast.AnnAssign) and isinstance(n.target, ast.Name) and n.value is not None:
                tgt = n.target
            else:
                continue
            name = tgt.id
            if (
                name.startswith("_")
                or name in loads
                or name in declared_elsewhere
                or name in ("__all__",)
            ):
                continue
            if name not in stores:
                stores[name] = tgt
        for name, tgt in stores.items():
            findings.append(
                Finding(path, tgt.lineno, tgt.col_offset, "L002",
                        f"local `{name}` is assigned but never read in `{fn.name}`")
            )


def _check_misc(tree: ast.Module, path: Path, findings: list[Finding]) -> None:
    # A FormattedValue's format_spec is itself a JoinedStr ("{x:.0f}" → ".0f")
    # with no placeholders of its own — never a finding.
    format_specs = {
        id(n.format_spec)
        for n in ast.walk(tree)
        if isinstance(n, ast.FormattedValue) and n.format_spec is not None
    }
    for node in ast.walk(tree):
        if isinstance(node, ast.JoinedStr):
            if id(node) in format_specs:
                continue
            if not any(isinstance(v, ast.FormattedValue) for v in node.values):
                findings.append(
                    Finding(path, node.lineno, node.col_offset, "L003",
                            "f-string without any placeholders")
                )
        elif isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for default in list(node.args.defaults) + [
                d for d in node.args.kw_defaults if d is not None
            ]:
                if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                    findings.append(
                        Finding(path, default.lineno, default.col_offset, "L004",
                                f"mutable default argument in `{node.name}`")
                    )
        elif isinstance(node, ast.ExceptHandler):
            if node.type is None:
                findings.append(
                    Finding(path, node.lineno, node.col_offset, "L005",
                            "bare `except:` — catch a specific exception")
                )
        elif isinstance(node, ast.Compare):
            for op, comparator in zip(node.ops, node.comparators):
                if isinstance(op, (ast.Eq, ast.NotEq)) and (
                    (isinstance(comparator, ast.Constant) and comparator.value is None)
                ):
                    findings.append(
                        Finding(path, node.lineno, node.col_offset, "L006",
                                "comparison to None with ==/!= — use `is` / `is not`")
                    )
            if (
                isinstance(node.left, ast.Constant)
                and node.left.value is None
                and any(isinstance(op, (ast.Eq, ast.NotEq)) for op in node.ops)
            ):
                findings.append(
                    Finding(path, node.lineno, node.col_offset, "L006",
                            "comparison to None with ==/!= — use `is` / `is not`")
                )
        elif isinstance(node, ast.Dict):
            seen: dict[object, int] = {}
            for key in node.keys:
                if isinstance(key, ast.Constant):
                    try:
                        hash(key.value)
                    except TypeError:
                        continue
                    if key.value in seen:
                        findings.append(
                            Finding(path, key.lineno, key.col_offset, "L007",
                                    f"duplicate dict key {key.value!r}")
                        )
                    else:
                        seen[key.value] = key.lineno


def lint_file(path: Path) -> list[Finding]:
    source = path.read_text(encoding="utf-8")
    try:
        tree = ast.parse(source, filename=str(path))
    except SyntaxError as exc:
        return [Finding(path, exc.lineno or 0, (exc.offset or 1) - 1, "L000",
                        f"syntax error: {exc.msg}")]
    findings: list[Finding] = []
    _check_imports(tree, path, findings)
    _check_unused_locals(tree, path, findings)
    _check_misc(tree, path, findings)
    lines = source.splitlines()
    kept = []
    for f in findings:
        line_text = lines[f.line - 1] if 0 < f.line <= len(lines) else ""
        if "# noqa" in line_text:
            continue
        kept.append(f)
    return kept


def iter_py_files(paths: list[str]) -> list[Path]:
    files: list[Path] = []
    for p in paths:
        path = (REPO / p) if not Path(p).is_absolute() else Path(p)
        if path.is_dir():
            files.extend(sorted(path.rglob("*.py")))
        elif path.suffix == ".py" and path.exists():
            files.append(path)
    return files


def main(argv: list[str]) -> int:
    paths = argv[1:] or DEFAULT_PATHS
    all_findings: list[Finding] = []
    files = iter_py_files(paths)
    for f in files:
        all_findings.extend(lint_file(f))
    all_findings.sort(key=lambda f: (str(f.path), f.line, f.col))
    for finding in all_findings:
        print(finding.render())
    if all_findings:
        print(f"mini_lint: {len(all_findings)} finding(s) in {len(files)} files — failing (warnings are errors)")
        return 1
    print(f"mini_lint: clean ({len(files)} files)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
