"""Make tests/ a real package so cross-test imports
(`from tests.test_x import helper`) resolve to pytest's OWN module instances
(one `tests.test_x` in sys.modules) from any cwd, instead of re-executing
sibling test files as second module objects and only working when cwd is the
repo root. pytest's prepend import mode puts the repo root (the first
ancestor without an __init__.py) on sys.path, so `python -m pytest
/root/repo/tests` now works from anywhere."""
