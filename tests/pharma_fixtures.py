"""Synthesize the reference's 7 XML input files from the shipped pharma.db.

The original XML files aren't in the reference repo — only their loaded
output (pharma.db) is. We reverse the load: salestxn rows in rowid order
are exactly the concatenation of the six files' records in load order
(1 overwrite + 5 appends of 4000/4000/3000/20/20/20 rows,
LoadXML2DB.ChatterjeeP.R:198,248,299,350,401,452), and the dims give the
name for each id. Record shapes follow FIXTURES.md §A6: reps carry an rID
attribute + positional children; transactions nest cust+country under a
customer element (exercising the `.//` descendant axis).
"""

from __future__ import annotations

import sqlite3
from pathlib import Path
from xml.sax.saxutils import escape

PHARMA_DB = "/root/reference/pharma.db"
FILE_SIZES = [4000, 4000, 3000, 20, 20, 20]


def synth_xml_fixtures(out_dir: str | Path) -> tuple[str, list[str]]:
    """Returns (reps_xml_path, [txn_xml_paths...])."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    con = sqlite3.connect(PHARMA_DB)

    reps = con.execute("SELECT rep_id, first_name, last_name, territory FROM reps").fetchall()
    reps_path = out / "pharmaReps.xml"
    with open(reps_path, "w") as f:
        f.write('<?xml version="1.0" encoding="UTF-8"?>\n<reps>\n')
        for rid, first, last, terr in reps:
            f.write(
                f'  <rep rID="{escape(rid)}"><first_name>{escape(first)}</first_name>'
                f"<last_name>{escape(last)}</last_name>"
                f"<territory>{escape(terr)}</territory></rep>\n"
            )
        f.write("</reps>\n")

    products = dict(con.execute("SELECT product_id, product_name FROM products").fetchall())
    customers = {
        cid: (name, country)
        for cid, name, country in con.execute(
            "SELECT customer_id, customer_name, country FROM customers"
        )
    }
    rows = con.execute(
        "SELECT txn_id, product_id, rep_id, customer_id, sale_date, sale_amount "
        "FROM salestxn ORDER BY rowid"
    ).fetchall()
    assert len(rows) == sum(FILE_SIZES), f"unexpected salestxn count {len(rows)}"

    txn_paths = []
    offset = 0
    for i, n in enumerate(FILE_SIZES, start=1):
        chunk = rows[offset : offset + n]
        offset += n
        p = out / f"pharmaSalesTxn-{i}.xml"
        txn_paths.append(str(p))
        with open(p, "w") as f:
            f.write('<?xml version="1.0" encoding="UTF-8"?>\n<txns>\n')
            for txn_id, pid, rep_id, cid, date, amount in chunk:
                cname, country = customers[cid]
                amt = int(amount) if float(amount).is_integer() else amount
                f.write(
                    "  <txn>"
                    f"<txnID>{txn_id}</txnID>"
                    f"<prod>{escape(products[pid])}</prod>"
                    f"<repID>{escape(str(rep_id))}</repID>"
                    f"<customer><cust>{escape(cname)}</cust>"
                    f"<country>{escape(country)}</country></customer>"
                    f"<date>{escape(date)}</date>"
                    f"<amount>{amt}</amount>"
                    "</txn>\n"
                )
            f.write("</txns>\n")
    con.close()
    return str(reps_path), txn_paths


def golden_tables() -> dict[str, list[tuple]]:
    con = sqlite3.connect(PHARMA_DB)
    out = {
        "reps": con.execute(
            "SELECT rep_id, first_name, last_name, territory FROM reps"
        ).fetchall(),
        "customers": con.execute(
            "SELECT customer_id, customer_name, country FROM customers"
        ).fetchall(),
        "products": con.execute("SELECT product_id, product_name FROM products").fetchall(),
    }
    con.close()
    return out
