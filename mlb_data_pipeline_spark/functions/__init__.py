from . import numeric, textfn, vector_math  # noqa: F401
