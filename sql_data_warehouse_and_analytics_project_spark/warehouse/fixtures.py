"""Deterministic dirty-CSV fixture generator (FIXTURES.md, SURVEY §5).

The reference ships its test inputs as six CSVs in ``docs/`` whose dirt each
silver cleaning rule exists to handle (profiled in SURVEY §1.3). This module
synthesizes a miniature equivalent with every dirt class represented, plus a
second "delta" snapshot that exercises SCD1/SCD2/watermark across two runs:

- untrimmed names / product lines (ref: proc_load_silver.sql:76-77,182)
- coded domains M/S, M/F/'', M/R/S/T/'' (ref: proc_load_silver.sql:78-87)
- NULL + duplicate cst_id (ref: proc_load_silver.sql:90-97)
- int yyyymmdd dates that are 0 or wrong length (ref: proc_load_silver.sql:234-236)
- sls_sales ≠ qty×price, NULL/negative price (ref: proc_load_silver.sql:238-240)
- ERP key drift NASAW…/AW-… vs AW… (SURVEY §1.3)
- country synonyms USA/US/DE/blank; messy gender domain
- bdate out of 1924..today range (ref: tests/quality_checks_silver.sql:124-128)

Everything is seeded ``random.Random`` + stdlib csv → byte-stable fixtures.
"""

from __future__ import annotations

import csv
import datetime as dt
import os
import random

COUNTRIES_RAW = [
    "Australia",
    "United States",
    "USA",
    "US",
    "United Kingdom",
    "France",
    "Canada",
    "Germany",
    "DE",
    "",
    " ",
]

CATEGORIES = [
    ("AC_BR", "Accessories", "Bike Racks", "Yes"),
    ("AC_BS", "Accessories", "Bike Stands", "No"),
    ("AC_HE", "Accessories", "Helmets", "Yes"),
    ("BI_MB", "Bikes", "Mountain Bikes", "Yes"),
    ("BI_RB", "Bikes", "Road Bikes", "Yes"),
    ("BI_TB", "Bikes", "Touring Bikes", "No"),
    ("CL_GL", "Clothing", "Gloves", "No"),
    ("CL_JE", "Clothing", "Jerseys", "Yes"),
    ("CO_FR", "Components", "Road Frames", "Yes"),
    ("CO_WH", "Components", "Wheels", "No"),
]

FIRST = ["Jon", "Eugene", "Ruben", "Christy", "Elizabeth", "Julio", "Mark", "Rob", "Shannon", "Jacquelyn"]
LAST = ["Yang", "Huang", "Torres", "Zhu", "Johnson", "Ruiz", "Lee", "Walters", "Carlson", "Suarez"]


def _w(path: str, header: list[str], rows: list[list]) -> None:
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def _d(base: dt.date, days: int) -> str:
    return (base + dt.timedelta(days=days)).isoformat()


def write_fixture(
    out_dir: str,
    *,
    seed: int = 7,
    n_customers: int = 200,
    n_products: int = 40,
    n_sales: int = 2000,
    delta: bool = False,
) -> str:
    """Write the 6 bronze CSVs into ``out_dir`` and return it.

    ``delta=False`` writes the run-1 base snapshot (create dates up to
    2024-03-31, order dates in Jan–Mar 2024). ``delta=True`` writes the run-2
    snapshot: same customer/product population with a deterministic subset
    mutated (SCD1 / SCD2 triggers) plus *new* customers & April sales, while
    retaining the old sales rows that the watermark filter must skip
    (ref: proc_load_silver.sql:95,242).
    """
    os.makedirs(out_dir, exist_ok=True)
    # Per-section RNGs so the base population is byte-identical between the
    # base and delta snapshots regardless of how many extra draws delta-only
    # rows consume (one shared stream would desynchronize later tables).
    rng = random.Random(seed * 10 + 1)      # customers
    rng_new = random.Random(seed * 10 + 2)  # delta-only new customers
    rng_p = random.Random(seed * 10 + 3)    # products
    rng_s = random.Random(seed * 10 + 4)    # base sales
    rng_sd = random.Random(seed * 10 + 5)   # delta-only sales
    rng_e = random.Random(seed * 10 + 6)    # erp
    base_day = dt.date(2024, 1, 1)

    # ---------------------------------------------------------- customers
    cust_rows: list[list] = []
    for i in range(n_customers):
        cid = 11000 + i
        fn, ln = rng.choice(FIRST), rng.choice(LAST)
        marital = rng.choice(["M", "S", "M", "S", ""])
        gndr = rng.choice(["M", "F", "M", "F", ""])
        create = rng.randrange(0, 89)  # Jan–Mar 2024 (≤ day 88, below dup-row day 89)
        if i % 37 == 0:
            fn = " " + fn  # leading space → TRIM rule
        if i % 41 == 0:
            ln = ln + " "  # trailing space
        if delta and i % 23 == 0:
            marital = "M" if marital != "M" else "S"  # SCD1 change trigger
            create = 95 + (i % 5)  # April date > run-1 watermark
        cust_rows.append(
            [cid, f"AW{cid:08d}", fn, ln, marital, gndr, _d(base_day, create)]
        )
    if delta:
        for i in range(10):  # brand-new customers, April create dates
            cid = 11000 + n_customers + i
            cust_rows.append(
                [cid, f"AW{cid:08d}", rng_new.choice(FIRST), rng_new.choice(LAST), "S", "F", _d(base_day, 100 + i)]
            )
    # dirt: NULL ids and duplicate ids with different create dates
    for k in range(3):
        cust_rows.append(["", f"AWX{k:07d}", "Ghost", "Row", "M", "M", _d(base_day, 5)])
    for k in range(4):
        dup = list(cust_rows[k * 3])
        dup[4] = "S" if dup[4] != "S" else "M"
        dup[6] = _d(base_day, 89)  # later create date wins (keep-latest)
        cust_rows.append(dup)
    _w(
        os.path.join(out_dir, "cust_info.csv"),
        ["cst_id", "cst_key", "cst_firstname", "cst_lastname", "cst_marital_status", "cst_gndr", "cst_create_date"],
        cust_rows,
    )

    # ----------------------------------------------------------- products
    prd_rows: list[list] = []
    prd_numbers: list[str] = []
    for i in range(n_products):
        pid = 200 + i
        cat_id, _, _, _ = CATEGORIES[i % len(CATEGORIES)]
        num = f"{cat_id[:2]}-{chr(65 + i % 26)}{i:03d}-{10 + i % 80}"
        prd_numbers.append(num)
        prd_key = f"{cat_id.replace('_', '-')}-{num}"  # chars 1-5 = cat, 7+ = number
        cost = rng_p.randrange(5, 2000)
        line = rng_p.choice(["M", "R", "S", "T", "M ", ""])
        if i % 29 == 0:
            cost = ""  # NULL cost → ISNULL(cost, 0)
        if delta and i % 11 == 0:
            cost = 2000 + i  # SCD2 change trigger (deterministic, no rng draw)
        prd_rows.append(
            [pid, prd_key, f"Product {num}", cost, line, _d(base_day, -300 + i), ""]
        )
    # dirt: one end < start to trip quality_checks_silver.sql:75-80 on bronze
    prd_rows.append([999, "XX-ZZ-BAD-01", "Bad Dates", 10, "M", _d(base_day, 10), _d(base_day, 1)])
    prd_numbers.append("BAD-01")
    _w(
        os.path.join(out_dir, "prd_info.csv"),
        ["prd_id", "prd_key", "prd_nm", "prd_cost", "prd_line", "prd_start_dt", "prd_end_dt"],
        prd_rows,
    )

    # -------------------------------------------------------------- sales
    def yyyymmdd(day_offset: int) -> int:
        d = base_day + dt.timedelta(days=day_offset)
        return d.year * 10000 + d.month * 100 + d.day

    sales_rows: list[list] = []
    n_base_sales = n_sales
    for i in range(n_base_sales):
        order = f"SO{43000 + i // 3}"  # one order spans ~3 lines
        prd = prd_numbers[rng_s.randrange(0, len(prd_numbers))]
        cust = 11000 + rng_s.randrange(0, n_customers)
        odt = rng_s.randrange(0, 85)  # Jan–Mar 2024
        qty = rng_s.randrange(1, 5)
        price = rng_s.randrange(5, 2000)
        sales = qty * price
        row = [
            order, prd, cust, yyyymmdd(odt), yyyymmdd(odt + 7), yyyymmdd(odt + 12),
            sales, qty, price,
        ]
        if i % 97 == 0:
            row[3] = 0  # zero order date → NULL
        if i % 101 == 0:
            row[3] = 202401  # wrong-length yyyymmdd → NULL
        if i % 89 == 0:
            row[8] = -price  # negative price → ABS repair
            row[6] = qty * price
        if i % 83 == 0:
            row[6] = ""  # NULL sales → recompute qty*ABS(price)
        if i % 79 == 0:
            row[6] = sales + 10  # inconsistent sales ≠ qty*price → recompute
        if i % 151 == 0:
            row[2] = 99999  # unknown customer → fact key -1
        sales_rows.append(row)
    if delta:
        for i in range(300):  # April sales — past the run-1 watermark
            order = f"SO{90000 + i // 3}"
            prd = prd_numbers[rng_sd.randrange(0, len(prd_numbers))]
            cust = 11000 + rng_sd.randrange(0, n_customers + 10)
            odt = 91 + rng_sd.randrange(0, 20)
            qty = rng_sd.randrange(1, 5)
            price = rng_sd.randrange(5, 2000)
            sales_rows.append(
                [order, prd, cust, yyyymmdd(odt), yyyymmdd(odt + 7), yyyymmdd(odt + 12), qty * price, qty, price]
            )
    _w(
        os.path.join(out_dir, "sales_details.csv"),
        ["sls_ord_num", "sls_prd_key", "sls_cust_id", "sls_order_dt", "sls_ship_dt", "sls_due_dt", "sls_sales", "sls_quantity", "sls_price"],
        sales_rows,
    )

    # ---------------------------------------------------------------- erp
    loc_rows, az_rows = [], []
    for i in range(n_customers + (10 if delta else 0)):
        cid = 11000 + i
        # LOC key drift: AW-00011000 (dash), country synonyms
        loc_rows.append([f"AW-{cid:08d}", COUNTRIES_RAW[rng_e.randrange(0, len(COUNTRIES_RAW))]])
        # AZ12 key drift: ~60% NAS prefix; messy gender; bad birthdates
        prefix = "NASAW" if rng_e.random() < 0.6 else "AW"
        b = dt.date(1950 + rng_e.randrange(0, 55), 1 + rng_e.randrange(0, 12), 1 + rng_e.randrange(0, 28))
        if i % 61 == 0:
            b = dt.date(2030, 1, 1)  # future birthdate → NULL rule
        if i % 67 == 0:
            b = dt.date(1900, 1, 1)  # < 1924 → flagged by DQ
        az_rows.append([f"{prefix}{cid:08d}", b.isoformat(), rng_e.choice(["Male", "Female", "F", "M", "", " "])])
    _w(os.path.join(out_dir, "LOC_A101.csv"), ["cid", "cntry"], loc_rows)
    _w(os.path.join(out_dir, "CUST_AZ12.csv"), ["cid", "bdate", "gen"], az_rows)

    cat_rows = [list(c) for c in CATEGORIES]
    cat_rows[2][1] = cat_rows[2][1] + " "  # trailing space → quality_checks_silver.sql:149-154
    _w(os.path.join(out_dir, "PX_CAT_G1V2.csv"), ["id", "cat", "subcat", "maintenance"], cat_rows)

    return out_dir
