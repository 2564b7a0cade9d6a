"""Deterministic CMS in-network-rates MRF synthesizer.

Generates schema-shaped JSON (same field inventory as the public CMS
price-transparency examples the reference tests against:
provider_references with provider_groups/location variants, in_network with
negotiated_rates -> negotiated_prices / provider_references) at any size,
for unit tests, end-to-end tests, and splitter throughput benchmarks.
Seeded -> byte-identical across runs.
"""

from __future__ import annotations

import json
import random
from typing import IO


def _provider_group(rng: random.Random, tin_pool=None) -> dict:
    # tin_pool: draw the TIN from a caller-fixed pool instead of the full
    # ~9e8 space — lets two differently-seeded payer files share provider
    # groups (the network-overlap fixtures); None keeps the historical
    # draw sequence byte-identical for every existing fixture
    return {
        "npi": [rng.randrange(10**9, 10**10) for _ in range(rng.randint(1, 6))],
        "tin": {
            "type": rng.choice(["ein", "npi"]),
            "value": rng.choice(tin_pool)
            if tin_pool
            else f"{rng.randrange(10, 99)}-{rng.randrange(10**6, 10**7)}",
        },
    }


def _provider_reference(rng: random.Random, gid: int, tin_pool=None) -> dict:
    if rng.random() < 0.1:
        return {
            "provider_group_id": gid,
            "location": f"https://example.com/provider_group_{gid}.json",
        }
    return {
        "provider_group_id": gid,
        "provider_groups": [
            _provider_group(rng, tin_pool) for _ in range(rng.randint(1, 3))
        ],
    }


def _negotiated_price(rng: random.Random) -> dict:
    p = {
        "negotiated_type": rng.choice(
            ["negotiated", "negotiated", "negotiated", "fee schedule"]
        ),
        "negotiated_rate": round(rng.uniform(5, 25000), 2),
        "expiration_date": "2026-01-01",
        "billing_class": rng.choice(["professional", "institutional"]),
    }
    if rng.random() < 0.7:
        p["service_code"] = rng.sample(
            ["01", "05", "06", "07", "11", "18", "19", "21", "22"],
            rng.randint(1, 3),
        )
    if rng.random() < 0.3:
        p["billing_code_modifier"] = rng.sample(["AS", "26", "TC", "50"], 1)
    return p


def _negotiated_rate(
    rng: random.Random, n_provider_refs: int, tin_pool=None
) -> dict:
    r: dict = {}
    if n_provider_refs and rng.random() < 0.5:
        r["provider_references"] = sorted(
            rng.sample(
                range(1, n_provider_refs + 1), rng.randint(1, min(3, n_provider_refs))
            )
        )
    else:
        r["provider_groups"] = [
            _provider_group(rng, tin_pool) for _ in range(rng.randint(1, 2))
        ]
    r["negotiated_prices"] = [
        _negotiated_price(rng) for _ in range(rng.randint(1, 3))
    ]
    return r


def _item_code(i: int) -> str:
    return str(10000 + (i * 7919) % 89999)


def _component_code(rng: random.Random, n_in_network: int) -> dict:
    """A covered_services / bundled_codes entry (the CMS capitation and
    bundle samples share this field inventory; see
    in-network-rates-capitation-single-plan-sample.json and
    in-network-rates-bundle-single-plan-sample.json in the reference's
    test resources). The component billing_code is drawn from the SAME
    code space as the file's own in_network items, so bundle components
    resolve to other items — what a bundle expansion join needs."""
    code = _item_code(rng.randrange(n_in_network))
    return {
        "billing_code_type": "CPT",
        "billing_code_type_version": "2025",
        "billing_code": code,
        "description": f"Component service {code}",
    }


def _in_network_item(
    rng: random.Random,
    i: int,
    n_provider_refs: int,
    tin_pool=None,
    arrangement_mix=None,
    n_in_network: int = 0,
) -> dict:
    code = _item_code(i)
    item = {
        "negotiation_arrangement": "ffs",
        "name": f"Procedure {code}",
        "billing_code_type": rng.choice(["CPT", "HCPCS", "MS-DRG"]),
        "billing_code_type_version": "2025",
        "billing_code": code,
        "description": f"Synthetic description for billing code {code} "
        + "x" * rng.randint(0, 120),
        "negotiated_rates": [
            _negotiated_rate(rng, n_provider_refs, tin_pool)
            for _ in range(rng.randint(1, 4))
        ],
    }
    # arrangement_mix: {"capitation": p1, "bundle": p2} — rng draws happen
    # ONLY when a mix is requested, so every pre-existing fixture stays
    # byte-identical for the default all-ffs files
    if arrangement_mix:
        u = rng.random()
        p_cap = arrangement_mix.get("capitation", 0.0)
        p_bun = arrangement_mix.get("bundle", 0.0)
        if u < p_cap:
            item["negotiation_arrangement"] = "capitation"
            item["covered_services"] = [
                _component_code(rng, n_in_network)
                for _ in range(rng.randint(2, 5))
            ]
        elif u < p_cap + p_bun:
            item["negotiation_arrangement"] = "bundle"
            item["bundled_codes"] = [
                _component_code(rng, n_in_network)
                for _ in range(rng.randint(2, 5))
            ]
    return item


def write_mrf(
    out: IO[str],
    n_in_network: int = 50,
    n_provider_refs: int = 10,
    seed: int = 42,
    indent: bool = True,
    min_element_bytes: int = 0,
    tin_pool=None,
    arrangement_mix=None,
) -> dict:
    """Stream a synthetic MRF JSON document to ``out``; returns summary counts.

    Streams item by item so multi-GB files can be generated in O(1) memory.
    ``min_element_bytes`` > 0 pads every array element (with a ``padding``
    string field) to at least that serialized size — used by the
    one-element-per-chunk splitter oracle, which needs every element to
    exceed the chunker's 1024-byte floor so chunk counts equal element
    counts exactly.
    """
    rng = random.Random(seed)
    base_dump = (lambda o: json.dumps(o, indent=2)) if indent else json.dumps

    def dump(o: dict) -> str:
        s = base_dump(o)
        short = min_element_bytes - len(s.encode("utf-8"))
        if short > 0:
            o = dict(o)
            o["padding"] = "x" * short
            s = base_dump(o)
        return s
    out.write("{\n")
    header = {
        "reporting_entity_name": "synthetic payer",
        "reporting_entity_type": "payer",
        "plan_name": "synthetic plan",
        "plan_id_type": "hios",
        "plan_id": "99999999999",
        "plan_market_type": "group",
        "last_updated_on": "2026-08-01",
    }
    for k, v in header.items():
        out.write(f"{json.dumps(k)}: {json.dumps(v)},\n")
    out.write('"provider_references": [')
    for gid in range(1, n_provider_refs + 1):
        if gid > 1:
            out.write(",")
        out.write(dump(_provider_reference(rng, gid, tin_pool)))
    out.write('],\n"in_network": [')
    for i in range(n_in_network):
        if i:
            out.write(",")
        out.write(
            dump(
                _in_network_item(
                    rng,
                    i,
                    n_provider_refs,
                    tin_pool,
                    arrangement_mix,
                    n_in_network,
                )
            )
        )
    out.write('],\n"version": "1.0.0"\n}\n')
    return {"in_network": n_in_network, "provider_references": n_provider_refs}


def write_mrf_file(
    path: str,
    n_in_network: int = 50,
    n_provider_refs: int = 10,
    seed: int = 42,
    indent: bool = True,
    min_element_bytes: int = 0,
    tin_pool=None,
    arrangement_mix=None,
) -> dict:
    with open(path, "w", encoding="utf-8") as f:
        return write_mrf(
            f,
            n_in_network,
            n_provider_refs,
            seed,
            indent,
            min_element_bytes,
            tin_pool,
            arrangement_mix,
        )


# ---------------------------------------------------------------------------
# allowed-amounts (out-of-network) files — the second machine-readable file
# type of the CMS Transparency-in-Coverage mandate (the reference repo
# ingests in-network-rates files; the chunker/source are schema-agnostic
# over top-level arrays, so the same engine streams these too: the
# out_of_network array chunks exactly like in_network does)
# ---------------------------------------------------------------------------


def _oon_payment(rng: random.Random) -> dict:
    allowed = round(rng.uniform(5, 8000), 2)
    return {
        "allowed_amount": allowed,
        "providers": [
            {
                # billed >= allowed (the balance-billing gap the file
                # exists to expose)
                "billed_charge": round(allowed * rng.uniform(1.0, 4.0), 2),
                "npi": [
                    rng.randrange(10**9, 10**10)
                    for _ in range(rng.randint(1, 4))
                ],
            }
            for _ in range(rng.randint(1, 3))
        ],
    }


def _oon_allowed_amount(rng: random.Random) -> dict:
    a = {
        "tin": {
            "type": rng.choice(["ein", "npi"]),
            "value": f"{rng.randrange(10, 99)}-{rng.randrange(10**6, 10**7)}",
        },
        "billing_class": rng.choice(["professional", "institutional"]),
        "payments": [_oon_payment(rng) for _ in range(rng.randint(1, 3))],
    }
    if rng.random() < 0.7:
        a["service_code"] = rng.sample(
            ["01", "05", "06", "11", "19", "22"], rng.randint(1, 3)
        )
    return a


def _oon_item(rng: random.Random, i: int) -> dict:
    code = _item_code(i)
    return {
        "name": f"Procedure {code}",
        "billing_code_type": rng.choice(["CPT", "HCPCS"]),
        "billing_code_type_version": "2025",
        "billing_code": code,
        "description": f"Out-of-network allowed amounts for {code}",
        "allowed_amounts": [
            _oon_allowed_amount(rng) for _ in range(rng.randint(1, 3))
        ],
    }


def write_allowed_amounts(
    out: IO[str],
    n_out_of_network: int = 50,
    seed: int = 7,
    indent: bool = True,
) -> dict:
    """Stream a synthetic CMS allowed-amounts JSON document: same scalar
    header inventory as the in-network files, one huge ``out_of_network``
    top-level array (billing code -> allowed_amounts -> payments ->
    providers with billed_charge + npi)."""
    rng = random.Random(seed)
    dump = (lambda o: json.dumps(o, indent=2)) if indent else json.dumps
    out.write("{\n")
    header = {
        "reporting_entity_name": "synthetic payer",
        "reporting_entity_type": "payer",
        "plan_name": "synthetic plan",
        "plan_id_type": "hios",
        "plan_id": "99999999999",
        "plan_market_type": "group",
        "last_updated_on": "2026-08-01",
    }
    for k, v in header.items():
        out.write(f"{json.dumps(k)}: {json.dumps(v)},\n")
    out.write('"out_of_network": [')
    for i in range(n_out_of_network):
        if i:
            out.write(",")
        out.write(dump(_oon_item(rng, i)))
    out.write('],\n"version": "1.0.0"\n}\n')
    return {"out_of_network": n_out_of_network}


def write_allowed_amounts_file(
    path: str,
    n_out_of_network: int = 50,
    seed: int = 7,
    indent: bool = True,
) -> dict:
    with open(path, "w", encoding="utf-8") as f:
        return write_allowed_amounts(f, n_out_of_network, seed, indent)


# ---------------------------------------------------------------------------
# table-of-contents index files — the CMS discovery format: one JSON object
# whose huge top-level array (reporting_structure) maps each reporting
# plan group to its in-network file URLs and allowed-amounts file URL.
# Real payer TOCs reach hundreds of MB (thousands of plans x file lists),
# so they need the same streaming splitter as the data files.
# ---------------------------------------------------------------------------


def _toc_plan(rng: random.Random, i: int) -> dict:
    return {
        "plan_name": f"synthetic plan {i}",
        "plan_id_type": rng.choice(["hios", "ein"]),
        "plan_id": str(rng.randrange(10**10, 10**11)),
        "plan_market_type": rng.choice(["group", "individual"]),
    }


def _toc_structure(rng: random.Random, i: int) -> dict:
    return {
        "reporting_plans": [
            _toc_plan(rng, i * 10 + j) for j in range(rng.randint(1, 4))
        ],
        "in_network_files": [
            {
                "description": "in-network file",
                "location": f"https://example.com/inn_{i}_{k}.json.gz",
            }
            for k in range(rng.randint(1, 3))
        ],
        "allowed_amount_file": {
            "description": "allowed amount file",
            "location": f"https://example.com/oon_{i}.json.gz",
        },
    }


def write_toc(
    out: IO[str], n_structures: int = 40, seed: int = 5, indent: bool = True
) -> dict:
    """Stream a synthetic CMS table-of-contents JSON document."""
    rng = random.Random(seed)
    dump = (lambda o: json.dumps(o, indent=2)) if indent else json.dumps
    out.write("{\n")
    out.write('"reporting_entity_name": "synthetic payer",\n')
    out.write('"reporting_entity_type": "payer",\n')
    out.write('"reporting_structure": [')
    for i in range(n_structures):
        if i:
            out.write(",")
        out.write(dump(_toc_structure(rng, i)))
    out.write('],\n"version": "1.0.0"\n}\n')
    return {"reporting_structure": n_structures}


def write_toc_file(
    path: str, n_structures: int = 40, seed: int = 5, indent: bool = True
) -> dict:
    with open(path, "w", encoding="utf-8") as f:
        return write_toc(f, n_structures, seed, indent)


# ---------------------------------------------------------------------------
# standalone provider-reference files — the CMS in-network schema lets a
# provider_references entry carry a `location` URL instead of inline
# provider_groups (the synthesizer already emits that variant ~10% of
# the time); the real payload then lives in a separate small JSON file
# `{"provider_groups": [...]}` the consumer must fetch and join back.
# The reference engine ignores these entirely; resolving them is a
# fourth file shape this engine ingests (plans/silver.py
# resolve_remote_provider_groups).
# ---------------------------------------------------------------------------


def materialize_remote_provider_files(
    mrf_path: str, out_dir: str, seed: int = 0
) -> dict:
    """Write the standalone provider-reference files an in-network MRF
    points at via ``location``: one ``provider_group_{gid}.json`` per
    location-only reference, content ``{"provider_groups": [...]}``
    seeded by ``(seed, gid)`` so each file is deterministic regardless
    of scan order. Returns ``{gid: path}``."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    with open(mrf_path, encoding="utf-8") as f:
        raw = json.load(f)
    written = {}
    for ref in raw.get("provider_references", []):
        if "location" in ref and "provider_groups" not in ref:
            gid = ref["provider_group_id"]
            rng = random.Random(f"{seed}:{gid}")
            p = os.path.join(out_dir, f"provider_group_{gid}.json")
            content = {
                "provider_groups": [
                    _provider_group(rng) for _ in range(rng.randint(1, 3))
                ]
            }
            with open(p, "w", encoding="utf-8") as out:
                json.dump(content, out, indent=2)
            written[gid] = p
    return written
