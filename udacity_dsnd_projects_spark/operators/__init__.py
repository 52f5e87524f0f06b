"""Relational operator builders (SURVEY.md §2).

Each module returns plain DataFrames built from declarative
DataFrame/SQL expressions — no UDFs, no collect — so Catalyst can
push filters into parquet scans, prune columns, and pick join
strategies (broadcast for the small dimensions here).
"""
