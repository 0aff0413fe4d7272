"""Native (C++) runtime components: PNG decode / data loading.

Built via `python scripts/build_native.py`; every consumer falls back to a
pure-Python path when the extension is absent.
"""
