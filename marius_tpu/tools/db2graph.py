"""Extract an edge list from a SQL database.

Parity with marius_db2graph (tools/db2graph/marius_db2graph.py:419): a config
names entity-node queries and edge queries; each edge query must return
(src_node, relation, dst_node) rows which are written as a tab-delimited edge
file ready for EdgeListConverter. Supports sqlite (stdlib) out of the box;
mysql/postgres if their drivers are installed.
"""

from __future__ import annotations

import os
from typing import Iterable, List, Optional

import yaml


def _connect(db_type: str, **kwargs):
    db_type = db_type.lower()
    if db_type == "sqlite":
        import sqlite3
        return sqlite3.connect(kwargs["database"])
    if db_type in ("mysql", "mariadb"):
        try:
            import mysql.connector
        except ImportError as e:
            raise RuntimeError("mysql-connector-python is not installed") from e
        return mysql.connector.connect(**kwargs)
    if db_type in ("postgres", "postgresql", "psql"):
        try:
            import psycopg2
        except ImportError as e:
            raise RuntimeError("psycopg2 is not installed") from e
        return psycopg2.connect(**kwargs)
    raise ValueError(f"Unknown db_type: {db_type}")


def run_db2graph(config_path: str, output_dir: str) -> str:
    """Config YAML: {db_type, connection: {...}, edge_queries: [SQL, ...]}."""
    with open(config_path) as f:
        cfg = yaml.safe_load(f)
    return extract_edges(
        db_type=cfg["db_type"],
        connection=cfg.get("connection") or {},
        edge_queries=cfg["edge_queries"],
        output_dir=output_dir,
    )


def extract_edges(db_type: str, connection: dict, edge_queries: Iterable[str],
                  output_dir: str, filename: str = "edges.txt") -> str:
    conn = _connect(db_type, **connection)
    os.makedirs(output_dir, exist_ok=True)
    out_path = os.path.join(output_dir, filename)
    n = 0
    with open(out_path, "w") as out:
        cur = conn.cursor()
        for q in edge_queries:
            cur.execute(q)
            for row in cur:
                if len(row) == 2:
                    out.write(f"{row[0]}\t{row[1]}\n")
                else:
                    out.write(f"{row[0]}\t{row[1]}\t{row[2]}\n")
                n += 1
    conn.close()
    if n == 0:
        raise RuntimeError("edge queries returned no rows")
    return out_path
