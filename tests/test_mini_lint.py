"""The AST lint gate (tools/mini_lint.py) — the clippy `-D warnings` analog.

Reference parity: the reference fails every commit/CI run on any compiler
warning (githooks/pre-commit:8-18, ci.yml:27-34). These tests lock the
detector behavior (it must fail on an unused import) and that the repo
tree itself is clean under it.
"""

import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

import mini_lint  # noqa: E402


def _lint_source(tmp_path, source, name="mod.py"):
    p = tmp_path / name
    p.write_text(textwrap.dedent(source))
    return mini_lint.lint_file(p)


def test_flags_unused_import(tmp_path):
    findings = _lint_source(tmp_path, """\
        import os
        import sys

        print(sys.argv)
    """)
    assert [f.code for f in findings] == ["L001"]
    assert "os" in findings[0].message and findings[0].line == 1


def test_flags_unused_from_import_and_respects_reexport_convention(tmp_path):
    findings = _lint_source(tmp_path, """\
        from json import dumps, loads
        from json import load as load  # explicit re-export convention

        print(dumps({}))
    """)
    assert [f.code for f in findings] == ["L001"]
    assert "loads" in findings[0].message


def test_init_py_imports_are_reexport_surface(tmp_path):
    findings = _lint_source(tmp_path, "from json import dumps\n", name="__init__.py")
    assert findings == []


def test_quoted_annotation_counts_as_use(tmp_path):
    findings = _lint_source(tmp_path, """\
        from typing import TYPE_CHECKING

        if TYPE_CHECKING:
            from decimal import Decimal

        def f(x: "Decimal") -> None:
            return None
    """)
    assert findings == []


def test_flags_unused_local_but_not_class_attrs_or_loop_vars(tmp_path):
    findings = _lint_source(tmp_path, """\
        def f():
            dead = compute()
            for i in range(3):
                pass

            class Handler:
                protocol_version = "HTTP/1.1"

            return Handler

        def compute():
            return 1
    """)
    assert [f.code for f in findings] == ["L002"]
    assert "dead" in findings[0].message


def test_format_spec_is_not_a_placeholderless_fstring(tmp_path):
    findings = _lint_source(tmp_path, """\
        x = 1.0
        print(f"{x:.0f}")
        print(f"no fields here")
    """)
    assert [f.code for f in findings] == ["L003"]
    assert findings[0].line == 3


def test_misc_checks(tmp_path):
    findings = _lint_source(tmp_path, """\
        def f(a=[]):
            try:
                pass
            except:
                pass
            if a == None:
                pass
            return {"k": 1, "k": 2}
    """)
    codes = sorted(f.code for f in findings)
    assert codes == ["L004", "L005", "L006", "L007"]


def test_noqa_suppresses(tmp_path):
    findings = _lint_source(tmp_path, "import os  # noqa\n")
    assert findings == []


def test_repo_tree_is_clean():
    rc = mini_lint.main(["mini_lint.py"])
    assert rc == 0
