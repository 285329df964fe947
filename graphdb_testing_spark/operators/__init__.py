"""Query kernels and analytic operators (SURVEY.md §2.4–§2.5).

Every operator is a pure function ``DataFrame -> DataFrame`` (plus a
driver-side fixpoint loop where the reference iterates); no RDDs, no
collect()-driven per-row logic.
"""
