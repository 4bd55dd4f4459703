"""Deterministic candy-store fixture generator (FIXTURES.md).

Distributions mirror dataset_22 (items/txn 1-5, qty 1-5 with ~7.5% null,
~1.5% all-null transactions) but stocks are set LOW so allocation
cancellation feedback actually triggers, and the edge cases FIXTURES.md
lists are guaranteed present: unknown product_id, a zero-transaction day
gap, qty == remaining stock, totals > 1,000 (format_number comma
grouping), half-cent rounding values.
"""

from __future__ import annotations

import json
import os
import random

N_PRODUCTS = 8


def write_fixture(root: str, n_days: int = 4, txn_per_day: int = 60, seed: int = 7):
    rng = random.Random(seed)
    os.makedirs(root, exist_ok=True)

    products = []
    for pid in range(1, N_PRODUCTS + 1):
        price = round(rng.uniform(0.52, 9.84), 2)
        products.append(
            {
                "product_id": pid,
                "product_name": f"Candy {pid}",
                "product_category": rng.choice(["Gummies & Jellies", "Marshmallow", "Toffee/Caramel"]),
                "product_subcategory": "Sub",
                "product_shape": "Rolls",
                "sales_price": f"{price:.2f}",
                "cost_to_make": f"{round(price * 0.55, 2):.2f}",
                # low stocks force exhaustion mid-period (FIXTURES.md)
                "stock": rng.randint(50, 200),
            }
        )
    # one very expensive product to force >1,000 order totals
    products[0]["sales_price"] = "999.99"
    products[0]["cost_to_make"] = "500.00"
    with open(os.path.join(root, "products.csv"), "w") as f:
        f.write(
            "product_id,product_name,product_category,product_subcategory,"
            "product_shape,sales_price,cost_to_make,stock\n"
        )
        for p in products:
            f.write(
                f"{p['product_id']},{p['product_name']},{p['product_category']},"
                f"{p['product_subcategory']},{p['product_shape']},"
                f"{p['sales_price']},{p['cost_to_make']},{p['stock']}\n"
            )

    with open(os.path.join(root, "customers.csv"), "w") as f:
        f.write("customer_id,first_name,last_name,email,address,phone\n")
        for cid in range(1, 11):
            f.write(
                f'{cid},First{cid},Last{cid},u{cid}@example.org,'
                f'"{cid} Main St, Town, ST 00000",555.000{cid:04d}\n'
            )

    tid = 10_000
    tx_paths = []
    # day 3 is intentionally EMPTY (zero transactions) — the reference
    # crashes on this (src/data_processor.py:477-479); the engine must not.
    days = [d for d in range(1, n_days + 2) if d != 3][:n_days]
    for day in days:
        date = f"202403{day:02d}"
        txns = []
        for i in range(txn_per_day):
            tid += rng.randint(1, 50)
            n_items = rng.randint(1, 5)
            items = []
            for _ in range(n_items):
                pid = rng.randint(1, N_PRODUCTS)
                qty = None if rng.random() < 0.075 else rng.randint(1, 5)
                items.append(
                    {"product_id": pid, "product_name": f"Candy {pid}", "qty": qty}
                )
            if rng.random() < 0.03:  # all-null transaction
                for it in items:
                    it["qty"] = None
            if i == 5:  # unknown product id (dropped by P4)
                items.append({"product_id": 999, "product_name": "Ghost", "qty": 2})
            ts = (
                f"2024-03-{day:02d}T{rng.randint(0, 23):02d}:"
                f"{rng.randint(0, 59):02d}:{rng.randint(0, 59):02d}."
                f"{rng.randint(0, 999999):06d}"
            )
            txns.append(
                {
                    "transaction_id": tid,
                    "customer_id": rng.randint(1, 10),
                    "timestamp": ts,
                    "items": items,
                }
            )
        path = os.path.join(root, f"transactions_{date}.json")
        with open(path, "w") as f:
            json.dump(txns, f, indent=1)
        tx_paths.append(path)
    return tx_paths
