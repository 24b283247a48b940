"""Operators: Pass-A profiling, Pass-B constraint checks, format tooling, and
training-data pipeline ops. Each module documents the reference behavior it
generalizes (file:line into /root/reference) and the Spark plan shape it targets."""

from .profile import profile, type_profile  # noqa: F401
from .violations import union_violations, verdicts  # noqa: F401
