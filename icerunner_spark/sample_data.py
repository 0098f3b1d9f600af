"""Deterministic sample-data profiles (reference: icerunner.py:313-666).

Five named profiles — analytics / events / sales / iot / default — with the
same column surface as the reference's faker-based generator (FIXTURES.md
§A; the container has no faker, so values come from seeded ``random`` with
fixed vocabularies). ``bootstrap_demo_tables`` mirrors the reference
server's auto-create of ``<name>``, ``<name>_events``, ``<name>_sales``,
``<name>_iot`` (icerunner.py:676-696).

All generation is seeded → identical tables across runs, which the
reference never guaranteed (SURVEY.md §5 test-strategy note).
"""

from __future__ import annotations

import datetime as dt
import json
import random
import uuid

import pyarrow as pa

EPOCH = dt.datetime(2025, 1, 1, 0, 0, 0)  # fixed "now" for determinism

_COUNTRIES = ["United States", "Germany", "Japan", "Brazil", "India", "France"]
_CITIES = ["Springfield", "Rivertown", "Lakeside", "Hillview", "Brookfield"]
_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
]
_NAMES = ["Alex Kim", "Sam Rivera", "Jordan Lee", "Casey Brown", "Robin Shah"]

_PRODUCTS = [
    ("P001", "Laptop Pro", "Electronics", 1299.99),
    ("P002", "Wireless Mouse", "Electronics", 24.99),
    ("P003", "Office Chair", "Furniture", 189.5),
    ("P004", "Standing Desk", "Furniture", 449.0),
    ("P005", "Notebook Set", "Stationery", 12.75),
    ("P006", "Gel Pens", "Stationery", 8.99),
    ("P007", "Monitor 27in", "Electronics", 329.99),
    ("P008", "Desk Lamp", "Furniture", 39.95),
]

_SENSORS = {
    "temperature": (-10.0, 45.0, "C"),
    "humidity": (0.0, 100.0, "%"),
    "pressure": (950.0, 1050.0, "hPa"),
    "air_quality": (0.0, 500.0, "AQI"),
    "light": (0.0, 10000.0, "lux"),
    "noise": (30.0, 120.0, "dB"),
}


def _uuid(rng: random.Random) -> str:
    return str(uuid.UUID(int=rng.getrandbits(128), version=4))


def _maybe(rng: random.Random, value, null_rate: float):
    return None if rng.random() < null_rate else value


def _ts(rng: random.Random, days_back: int) -> dt.datetime:
    secs = rng.uniform(0, days_back * 86400)
    ms = int(secs * 1000)
    return EPOCH - dt.timedelta(milliseconds=ms)


def _analytics(rng: random.Random, n: int) -> pa.Table:
    rows = []
    for _ in range(n):
        visitor = _uuid(rng)
        ts = _ts(rng, 30)
        rows.append(
            {
                "visitor_id": visitor,
                "session_id": f"{visitor}_{int(ts.timestamp())}",
                "timestamp": ts,
                "page_url": f"/{rng.choice(_WORDS)}/{rng.choice(_WORDS)}",
                "referrer": _maybe(rng, f"https://example.com/{rng.choice(_WORDS)}", 0.3),
                "user_agent": _maybe(rng, f"Mozilla/5.0 ({rng.choice(['X11', 'Macintosh', 'Windows NT'])})", 0.1),
                "device_type": _maybe(rng, rng.choice(["desktop", "mobile", "tablet"]), 0.1),
                "country": _maybe(rng, rng.choice(_COUNTRIES), 0.1),
                "city": _maybe(rng, rng.choice(_CITIES), 0.1),
                "browser": _maybe(rng, rng.choice(["Chrome", "Firefox", "Safari", "Edge"]), 0.1),
                "os": _maybe(rng, rng.choice(["Windows", "MacOS", "Linux", "iOS", "Android"]), 0.1),
                "duration_seconds": _maybe(rng, rng.randint(5, 1800), 0.1),
                "page_views": _maybe(rng, rng.randint(1, 20), 0.1),
                "conversion": _maybe(rng, rng.random() < 0.1, 0.1),
            }
        )
    schema = pa.schema(
        [
            ("visitor_id", pa.string()),
            ("session_id", pa.string()),
            ("timestamp", pa.timestamp("ms")),
            ("page_url", pa.string()),
            ("referrer", pa.string()),
            ("user_agent", pa.string()),
            ("device_type", pa.string()),
            ("country", pa.string()),
            ("city", pa.string()),
            ("browser", pa.string()),
            ("os", pa.string()),
            ("duration_seconds", pa.int32()),
            ("page_views", pa.int16()),
            ("conversion", pa.bool_()),
        ]
    )
    return pa.Table.from_pylist(rows, schema=schema)


def _events(rng: random.Random, n: int) -> pa.Table:
    rows = []
    for _ in range(n):
        etype = rng.choice(
            ["page_view", "click", "form_submit", "api_call", "error", "login", "logout"]
        )
        rows.append(
            {
                "event_id": _uuid(rng),
                "event_type": etype,
                "timestamp": _ts(rng, 7),
                "user_id": _maybe(rng, _uuid(rng), 0.2),
                "device_id": _maybe(
                    rng, ":".join(f"{rng.randint(0, 255):02x}" for _ in range(6)), 0.3
                ),
                "ip_address": _maybe(
                    rng, ".".join(str(rng.randint(1, 254)) for _ in range(4)), 0.1
                ),
                "severity": _maybe(rng, rng.choice(["debug", "info", "warning", "error", "critical"]), 0.1),
                "component": _maybe(
                    rng,
                    rng.choice(["frontend", "backend", "database", "auth", "api", "cache", "scheduler"]),
                    0.1,
                ),
                "message": _maybe(rng, " ".join(rng.choices(_WORDS, k=6)), 0.1),
                "properties": _maybe(
                    rng,
                    json.dumps({"key1": rng.choice(_WORDS), "key2": rng.choice(_WORDS)}),
                    0.5,
                ),
                "duration_ms": rng.randint(1, 5000) if etype in ("api_call", "form_submit") else None,
                "status_code": rng.choice([200, 201, 400, 404, 500]) if etype == "api_call" else None,
            }
        )
    schema = pa.schema(
        [
            ("event_id", pa.string()),
            ("event_type", pa.string()),
            ("timestamp", pa.timestamp("ms")),
            ("user_id", pa.string()),
            ("device_id", pa.string()),
            ("ip_address", pa.string()),
            ("severity", pa.string()),
            ("component", pa.string()),
            ("message", pa.string()),
            ("properties", pa.string()),
            ("duration_ms", pa.int64()),
            ("status_code", pa.int16()),
        ]
    )
    return pa.Table.from_pylist(rows, schema=schema)


def _sales(rng: random.Random, n: int) -> pa.Table:
    customers = [_uuid(rng) for _ in range(20)]
    rows = []
    for _ in range(n):
        pid, pname, cat, price = rng.choice(_PRODUCTS)
        qty = rng.randint(1, 5)
        rows.append(
            {
                "order_id": _uuid(rng),
                "customer_id": rng.choice(customers),
                "transaction_date": _ts(rng, 90),
                "product_id": pid,
                "product_name": pname,
                "category": _maybe(rng, cat, 0.1),
                "quantity": qty,
                "unit_price": price,
                "total_amount": round(price * qty, 2),
                "payment_method": _maybe(
                    rng, rng.choice(["Credit Card", "Debit Card", "PayPal", "Cash", "Bank Transfer"]), 0.1
                ),
                "store_id": _maybe(rng, f"S{rng.randint(1, 5):03d}", 0.1),
                "salesperson": _maybe(rng, rng.choice(_NAMES), 0.1),
                "promotion_code": _maybe(rng, f"PROMO{rng.randint(10, 99)}", 0.7),
                "is_returned": _maybe(rng, rng.random() < 0.05, 0.1),
            }
        )
    schema = pa.schema(
        [
            ("order_id", pa.string()),
            ("customer_id", pa.string()),
            ("transaction_date", pa.timestamp("ms")),
            ("product_id", pa.string()),
            ("product_name", pa.string()),
            ("category", pa.string()),
            ("quantity", pa.int16()),
            ("unit_price", pa.float64()),
            ("total_amount", pa.float64()),
            ("payment_method", pa.string()),
            ("store_id", pa.string()),
            ("salesperson", pa.string()),
            ("promotion_code", pa.string()),
            ("is_returned", pa.bool_()),
        ]
    )
    return pa.Table.from_pylist(rows, schema=schema)


def _iot(rng: random.Random, n: int) -> pa.Table:
    devices = [
        f"IOT-{rng.choice(['ABC', 'DEF', 'GHI'])}-{rng.randint(1000, 9999)}" for _ in range(30)
    ]
    rows = []
    for _ in range(n):
        stype = rng.choice(list(_SENSORS))
        lo, hi, unit = _SENSORS[stype]
        value = round(rng.uniform(lo, hi), 2)
        alert = (stype == "temperature" and (value > 40 or value < 0)) or (
            stype == "air_quality" and value > 300
        )
        rows.append(
            {
                "reading_id": _uuid(rng),
                "device_id": rng.choice(devices),
                "sensor_type": stype,
                "timestamp": _ts(rng, 3),
                "value": value,
                "unit": _maybe(rng, unit, 0.1),
                "latitude": _maybe(rng, round(rng.uniform(-90, 90), 6), 0.1),
                "longitude": _maybe(rng, round(rng.uniform(-180, 180), 6), 0.1),
                "battery_level": _maybe(rng, round(rng.uniform(0, 100), 1), 0.1),
                "signal_strength": _maybe(rng, rng.randint(-120, -30), 0.1),
                "alert_triggered": _maybe(rng, alert, 0.1),
                "firmware_version": _maybe(
                    rng, rng.choice(["v1.0.0", "v1.1.2", "v1.2.0", "v2.0.1", "v2.1.0"]), 0.1
                ),
            }
        )
    schema = pa.schema(
        [
            ("reading_id", pa.string()),
            ("device_id", pa.string()),
            ("sensor_type", pa.string()),
            ("timestamp", pa.timestamp("ms")),
            ("value", pa.float64()),
            ("unit", pa.string()),
            ("latitude", pa.float64()),
            ("longitude", pa.float64()),
            ("battery_level", pa.float32()),
            ("signal_strength", pa.int8()),
            ("alert_triggered", pa.bool_()),
            ("firmware_version", pa.string()),
        ]
    )
    return pa.Table.from_pylist(rows, schema=schema)


def _default(rng: random.Random, n: int) -> pa.Table:
    rows = [
        {
            "id": i + 1,
            "value": f"sample_value_{i + 1}",
            "timestamp": EPOCH - dt.timedelta(hours=rng.randint(0, 168)),
            "is_active": _maybe(rng, rng.random() < 0.5, 0.1),
        }
        for i in range(n)
    ]
    schema = pa.schema(
        [
            ("id", pa.int64()),
            ("value", pa.string()),
            ("timestamp", pa.timestamp("ms")),
            ("is_active", pa.bool_()),
        ]
    )
    return pa.Table.from_pylist(rows, schema=schema)


_PROFILES = {
    "analytics": _analytics,
    "events": _events,
    "sales": _sales,
    "iot": _iot,
    "default": _default,
}


def create_sample_table(
    num_rows: int = 100, data_profile: str = "default", seed: int = 42
) -> pa.Table:
    """Build one profile's Arrow table (icerunner.py:313-666 parity,
    deterministic)."""
    if data_profile not in _PROFILES:
        raise ValueError(f"unknown profile {data_profile!r}; one of {sorted(_PROFILES)}")
    return _PROFILES[data_profile](random.Random(seed), num_rows)


def bootstrap_demo_tables(connector, table_name: str, seed: int = 42) -> None:
    """Auto-create the demo tables the reference server boots with
    (icerunner.py:676-696): <name> (analytics, 200 rows) + _events/_sales/_iot
    (100 rows each). Idempotent."""
    specs = [
        (table_name, "analytics", 200),
        (f"{table_name}_events", "events", 100),
        (f"{table_name}_sales", "sales", 100),
        (f"{table_name}_iot", "iot", 100),
    ]
    for name, profile, rows in specs:
        if name not in connector.tables:
            connector.create_table(name, create_sample_table(rows, profile, seed))
