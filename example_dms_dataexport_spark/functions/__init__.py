"""Deterministic, engine-agnostic expression builders.

``texthash`` defines every hash/tokenization primitive twice from shared
constants — once as a PySpark Column, once as a DuckDB SQL fragment — so
operator results can be hash-compared against an independent SQL oracle.
"""
