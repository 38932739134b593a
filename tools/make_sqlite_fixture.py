#!/usr/bin/env python3
"""One-time generator for the SQLite source fixture (S5).

Produces src/main/resources/graft/fixtures/fa_bin.sqlite3 shaped like
the findfurrypicbot dump (posts(id, a_hash, p_hash, d_hash, w_hash)
with 8-byte perceptual-hash blobs), small page size to force a
multi-level table B-tree, plus a `notes` table whose body spills into
overflow pages. Deterministic: hash blobs are md5(f"{id}-{kind}")[:8].
"""
import hashlib
import os
import sqlite3

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src/main/resources/graft/fixtures/fa_bin.sqlite3")


def h(i, kind):
    return hashlib.md5(f"{i}-{kind}".encode()).digest()[:8]


def main():
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    if os.path.exists(OUT):
        os.remove(OUT)
    con = sqlite3.connect(OUT)
    con.execute("PRAGMA page_size = 512")
    con.execute("PRAGMA journal_mode = DELETE")
    con.execute("""CREATE TABLE posts (
        id INTEGER PRIMARY KEY,
        a_hash BLOB, p_hash BLOB, d_hash BLOB, w_hash BLOB)""")
    con.executemany(
        "INSERT INTO posts VALUES (?,?,?,?,?)",
        [(i, h(i, "a"), h(i, "p"), h(i, "d"), h(i, "w"))
         for i in range(1, 301)])
    con.execute("CREATE TABLE notes (id INTEGER PRIMARY KEY, body TEXT)")
    con.execute("INSERT INTO notes VALUES (1, ?)", ("x" * 10000,))
    con.execute("INSERT INTO notes VALUES (2, NULL)")
    con.commit()
    con.close()
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes)")


if __name__ == "__main__":
    main()
