"""Native (C++) acceleration layer.

`fastops` loads the compiled extension (built via native/build.py with g++)
when present; every caller has a pure-Python fallback, so the package works
without the build step.
"""
