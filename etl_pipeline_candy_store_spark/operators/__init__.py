"""Custom operators: the pieces Catalyst cannot express declaratively.

Everything here is either a composition of built-in DataFrame ops or an
Arrow-batched ``applyInPandas`` group function — never a row-at-a-time
Python UDF.
"""
