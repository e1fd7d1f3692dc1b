"""Driver-contract shape checks for __spark_entry__ — no Spark session.

The driver runs every queries() entry side-by-side with its oracle_sql()
twin at sf0.01; a name present on one side only silently downgrades (or
breaks) the correctness gate, so key-set equality is pinned here.
"""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry


def test_every_query_has_an_oracle_and_vice_versa():
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert q == o, (sorted(q - o), sorted(o - q))
    assert len(q) >= 41


def test_oracle_sql_are_nonempty_strings():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip(), name


def test_query_callables_take_spark_and_sf_dir():
    import inspect

    for name, fn in entry.queries().items():
        params = [
            p
            for p in inspect.signature(fn).parameters.values()
            if p.default is inspect.Parameter.empty
            and p.kind
            in (
                inspect.Parameter.POSITIONAL_ONLY,
                inspect.Parameter.POSITIONAL_OR_KEYWORD,
            )
        ]
        assert len(params) == 2, (name, params)
