"""Import the REAL lmms-eval package from the reference tree (read-only).

The reference vendors lmms-eval at /root/reference/lmms-eval; SURVEY §7.8 keeps
it an external dependency boundary, and the drop-in-compatibility claim of
eval/lmms_adapter.py is that an actual lmms-eval installation can drive
VisperLmms. This module makes that executable TODAY: it sys.path-imports the
reference's package (never copying it) after registering minimal stand-ins for
four pip deps absent from this environment (pytz, sqlitedict, hf_transfer,
evaluate) that the evaluator path imports but the tested flow exercises only
trivially (timestamps, caching, metric lookup).

Used by tests/test_lmms_real.py. Returns None (tests skip) if the import fails
for environmental reasons.
"""

from __future__ import annotations

import datetime
import re
import sys
import types

LMMS_EVAL_ROOT = "/root/reference/lmms-eval"


def _install_stub_modules() -> None:
    if "pytz" not in sys.modules:
        pytz = types.ModuleType("pytz")
        pytz.__version__ = "2024.1"
        pytz.UTC = pytz.utc = datetime.timezone.utc
        pytz.timezone = lambda *a, **k: datetime.timezone.utc
        sys.modules["pytz"] = pytz
    if "sqlitedict" not in sys.modules:
        sq = types.ModuleType("sqlitedict")
        sq.__version__ = "2.1.0"

        class SqliteDict(dict):
            def __init__(self, *a, **k):
                super().__init__()

            def commit(self):
                pass

            def close(self):
                pass

        sq.SqliteDict = SqliteDict
        sys.modules["sqlitedict"] = sq
    if "hf_transfer" not in sys.modules:
        hf = types.ModuleType("hf_transfer")
        hf.__version__ = "0.1.0"
        sys.modules["hf_transfer"] = hf
    if "evaluate" not in sys.modules:
        # hf-evaluate stand-in: only exact_match is looked up by the tested flow
        # (lmms_eval/api/metrics.py:146); semantics per its documented kwargs.
        ev = types.ModuleType("evaluate")
        ev.__version__ = "0.4.0"

        class _ExactMatch:
            def compute(self, predictions=None, references=None, **kw):
                def norm(s):
                    s = str(s)
                    for r in kw.get("regexes_to_ignore") or []:
                        s = re.sub(r, "", s)
                    if kw.get("ignore_case"):
                        s = s.lower()
                    if kw.get("ignore_punctuation"):
                        import string

                        s = s.translate(str.maketrans("", "", string.punctuation))
                    if kw.get("ignore_numbers"):
                        s = s.translate(str.maketrans("", "", "0123456789"))
                    return s

                m = [
                    float(norm(p) == norm(r))
                    for p, r in zip(predictions, references)
                ]
                return {"exact_match": sum(m) / max(len(m), 1)}

        ev.load = lambda name, **k: _ExactMatch()
        sys.modules["evaluate"] = ev


def import_real_lmms_eval():
    """Returns the imported lmms_eval package, or None if unavailable."""
    _install_stub_modules()
    if LMMS_EVAL_ROOT not in sys.path:
        sys.path.insert(0, LMMS_EVAL_ROOT)
    try:
        import lmms_eval  # noqa: F401
        import lmms_eval.evaluator  # noqa: F401
        import lmms_eval.api.task  # noqa: F401
        import lmms_eval.filters.extraction  # noqa: F401

        return lmms_eval
    except Exception:
        return None


def load_task_utils(task: str, module: str = "utils"):
    """importlib-load a reference task's utils module (e.g. 'realworldqa',
    or ('refcoco', 'utils_rec')) without package __init__ side effects
    beyond lmms_eval itself."""
    import importlib.util

    _install_stub_modules()
    if LMMS_EVAL_ROOT not in sys.path:
        sys.path.insert(0, LMMS_EVAL_ROOT)
    path = f"{LMMS_EVAL_ROOT}/lmms_eval/tasks/{task}/{module}.py"
    spec = importlib.util.spec_from_file_location(
        f"_ref_{task}_{module}", path
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
