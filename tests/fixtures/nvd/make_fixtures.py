"""Deterministic generator for the NVD-1.1-shaped test feeds.

Run from the repo root to (re)create the committed fixtures:

    python tests/fixtures/nvd/make_fixtures.py

Two artifacts in the NVD 1.1 feed shape (one JSON document per feed,
gzip-compressed, wrapper keys + CVE_Items):

- ``nvdcve-1.1-2024.json.gz``  — 8 CVEs, the "year feed". Includes
  linux-flavored cpe23Uris (the reference README's flagship query
  target), an entry with empty ``nodes``, an entry with no
  ``configurations`` at all, a doubly-nested ``children[].cpe_match[]``
  entry, and unknown keys that schema projection must drop.
- ``nvdcve-1.1-recent.json.gz`` — 4 CVEs: 2 IDs overlapping the year
  feed (with LATER lastModifiedDate — first-write-wins must drop them)
  and 2 new IDs.
"""

from __future__ import annotations

import gzip
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def _cpe(uri: str, vulnerable: bool = True, **versions: str) -> dict:
    return {"vulnerable": vulnerable, "cpe23Uri": uri, **versions}


#: CVSS v3 enum → vectorString code (the analytics queries parse the
#: vectorString back out with regexp and cross-check these fields).
_AV_CODE = {"NETWORK": "N", "ADJACENT_NETWORK": "A", "LOCAL": "L", "PHYSICAL": "P"}
_UI_CODE = {"NONE": "N", "REQUIRED": "R"}


def _item(
    num: int,
    year: int = 2024,
    assigner: str = "cve@example.test",
    cpe_uris: list[str] | None = None,
    children: list[dict] | None = None,
    no_configurations: bool = False,
    published: str = "2024-01-01T10:15Z",
    modified: str = "2024-01-02T09:30Z",
    severity_v3: str = "HIGH",
    base_score: float = 8.1,
    description: str = "A vulnerability was found.",
    cwe: str = "CWE-79",
    attack_vector: str = "NETWORK",
    user_interaction: str = "NONE",
    refsource: str = "MISC",
    tags: tuple[str, ...] = ("Patch", "Vendor Advisory"),
    n_refs: int = 1,
    cpe_versions: dict | None = None,  # uri → version-bound kwargs
) -> dict:
    cve_id = f"CVE-{year}-{num:04d}"
    item = {
        "cve": {
            "data_type": "CVE",
            "data_format": "MITRE",
            "data_version": 4.0,
            "CVE_data_meta": {"ID": cve_id, "ASSIGNER": assigner},
            "problemtype": {
                "problemtype_data": [
                    {"description": [{"lang": "en", "value": cwe}]}
                ]
            },
            "references": {
                "reference_data": [
                    {
                        "url": f"https://advisories.example.test/{cve_id}/{i}",
                        "name": f"{cve_id}-{i}",
                        "refsource": refsource,
                        "tags": list(tags),
                    }
                    for i in range(n_refs)
                ]
            },
            "description": {
                "description_data": [{"lang": "en", "value": description}]
            },
        },
        "impact": {
            "baseMetricV2": {
                "cvssV2": {
                    "version": 2.0,
                    "vectorString": "AV:N/AC:L/Au:N/C:P/I:P/A:P",
                    "accessVector": "NETWORK",
                    "accessComplexity": "LOW",
                    "authentication": "NONE",
                    "confidentialityImpact": "PARTIAL",
                    "integrityImpact": "PARTIAL",
                    "availabilityImpact": "PARTIAL",
                    "baseScore": 7.5,
                },
                "severity": "HIGH",
                "exploitabilityScore": 10.0,
                "impactScore": 6.4,
                "obtainAllPrivilege": False,
                "obtainUserPrivilege": False,
                "obtainOtherPrivilege": False,
                "userInteractionRequired": False,
                "acInsufInfo": False,
            },
            "baseMetricV3": {
                "cvssV3": {
                    "version": 3.1,
                    "vectorString": (
                        f"CVSS:3.1/AV:{_AV_CODE[attack_vector]}/AC:L/PR:N"
                        f"/UI:{_UI_CODE[user_interaction]}/S:U/C:H/I:H/A:N"
                    ),
                    "attackVector": attack_vector,
                    "attackComplexity": "LOW",
                    "privilegesRequired": "NONE",
                    "userInteraction": user_interaction,
                    "scope": "UNCHANGED",
                    "confidentialityImpact": "HIGH",
                    "integrityImpact": "HIGH",
                    "availabilityImpact": "NONE",
                    "baseScore": base_score,
                    "baseSeverity": severity_v3,
                },
                "exploitabilityScore": 3.9,
                "impactScore": 5.2,
            },
        },
        "publishedDate": published,
        "lastModifiedDate": modified,
        # Unknown keys: schema projection (P3 / ignore_unknown_values)
        # must silently drop both of these.
        "sourceIdentifier": "feed-generator",
        "vendorComments": [{"organization": "none", "comment": "n/a"}],
    }
    if not no_configurations:
        nodes = []
        if cpe_uris is not None:
            nodes.append(
                {
                    "operator": "OR",
                    "cpe_match": [
                        _cpe(u, **(cpe_versions or {}).get(u, {}))
                        for u in cpe_uris
                    ],
                    "children": [],
                }
            )
        if children is not None:
            nodes.append({"operator": "AND", "cpe_match": [], "children": children})
        item["configurations"] = {"CVE_data_version": 4.0, "nodes": nodes}
    return item


def _feed(items: list[dict], timestamp: str) -> dict:
    return {
        "CVE_data_type": "CVE",
        "CVE_data_format": "MITRE",
        "CVE_data_version": "4.0",
        "CVE_data_numberOfCVEs": str(len(items)),
        "CVE_data_timestamp": timestamp,
        "CVE_Items": items,
    }


def year_feed() -> dict:
    items = [
        _item(
            1,
            cpe_uris=["cpe:2.3:o:linux:linux_kernel:*:*:*:*:*:*:*:*"],
            description="Flaw in the linux kernel scheduler.",
            published="2024-01-03T08:15Z",
            modified="2024-01-04T11:00Z",
            refsource="CONFIRM",
            n_refs=2,
            cpe_versions={
                "cpe:2.3:o:linux:linux_kernel:*:*:*:*:*:*:*:*": {
                    "versionEndExcluding": "6.2"
                }
            },
        ),
        _item(
            2,
            cpe_uris=["cpe:2.3:a:vendor_a:webapp:1.0:*:*:*:*:*:*:*"],
            description="SQL injection in webapp login.",
            cwe="CWE-89",
            published="2024-01-05T14:30Z",
            modified="2024-01-06T09:00Z",
            user_interaction="REQUIRED",
            refsource="MISC",
            tags=("Exploit", "Third Party Advisory"),
        ),
        _item(
            3,
            # Doubly-nested: the linux match hides inside children[].cpe_match[]
            children=[
                {
                    "operator": "OR",
                    "negate": False,
                    "cpe_match": [
                        _cpe(
                            "cpe:2.3:o:linux:linux_kernel:4.19:*:*:*:*:*:*:*",
                            versionEndExcluding="5.10",
                        )
                    ],
                }
            ],
            description="Privilege escalation via nested configuration.",
            cwe="CWE-269",
            published="2024-02-01T00:15Z",
            modified="2024-02-02T12:45Z",
            severity_v3="CRITICAL",
            base_score=9.8,
            attack_vector="LOCAL",
            refsource="MLIST",
            tags=("Mailing List", "Patch"),
            n_refs=3,
        ),
        _item(
            4,
            cpe_uris=[],  # node list present but empty cpe_match
            description="Denial of service with empty match list.",
            cwe="CWE-400",
            published="2024-02-10T16:15Z",
            modified="2024-02-11T10:30Z",
            severity_v3="MEDIUM",
            base_score=5.3,
            attack_vector="ADJACENT_NETWORK",
            refsource="FULLDISC",
            tags=("Exploit",),
        ),
        _item(
            5,
            no_configurations=True,  # missing struct entirely → null
            description="Reserved entry without configurations.",
            published="2024-03-01T09:15Z",
            modified="2024-03-01T09:15Z",
            severity_v3="LOW",
            base_score=3.1,
            attack_vector="PHYSICAL",
            user_interaction="REQUIRED",
            n_refs=0,  # empty reference_data: UNNEST/explode must drop it
        ),
        _item(
            6,
            cpe_uris=[
                "cpe:2.3:o:linux:linux_kernel:5.15:*:*:*:*:*:*:*",
                "cpe:2.3:o:vendor_b:embedded_os:2.0:*:*:*:*:*:*:*",
            ],
            description="Race condition in linux kernel io_uring.",
            cwe="CWE-362",
            published="2024-03-15T20:15Z",
            modified="2024-03-16T07:00Z",
            severity_v3="HIGH",
            base_score=7.0,
            attack_vector="LOCAL",
            refsource="CONFIRM",
            tags=("Patch",),
            n_refs=2,
            cpe_versions={
                "cpe:2.3:o:linux:linux_kernel:5.15:*:*:*:*:*:*:*": {
                    "versionStartIncluding": "5.10",
                    "versionEndExcluding": "5.16",
                }
            },
        ),
        _item(
            7,
            cpe_uris=["cpe:2.3:a:vendor_c:parser:3.2:*:*:*:*:*:*:*"],
            description="Buffer overflow in parser.",
            cwe="CWE-120",
            published="2024-04-01T12:15Z",
            modified="2024-04-02T13:30Z",
            severity_v3="CRITICAL",
            base_score=9.1,
            user_interaction="REQUIRED",
            refsource="FULLDISC",
            tags=("Exploit", "Mailing List"),
            n_refs=2,
            cpe_versions={
                "cpe:2.3:a:vendor_c:parser:3.2:*:*:*:*:*:*:*": {
                    "versionEndIncluding": "3.2"
                }
            },
        ),
        _item(
            8,
            cpe_uris=["cpe:2.3:a:vendor_d:crypto_lib:0.9:*:*:*:*:*:*:*"],
            description="Weak randomness in crypto_lib.",
            cwe="CWE-338",
            published="2024-04-20T03:15Z",
            modified="2024-04-21T18:00Z",
            severity_v3="MEDIUM",
            base_score=6.5,
            attack_vector="LOCAL",
            refsource="MLIST",
            tags=("Mailing List",),
        ),
    ]
    return _feed(items, "2024-05-01T00:00Z")


def recent_feed() -> dict:
    items = [
        # Overlaps year feed (later modification — must be dropped by
        # first-write-wins):
        _item(
            2,
            cpe_uris=["cpe:2.3:a:vendor_a:webapp:1.0:*:*:*:*:*:*:*"],
            description="SQL injection in webapp login. (REVISED)",
            cwe="CWE-89",
            published="2024-01-05T14:30Z",
            modified="2024-05-02T10:00Z",
        ),
        _item(
            6,
            cpe_uris=["cpe:2.3:o:linux:linux_kernel:5.15:*:*:*:*:*:*:*"],
            description="Race condition in linux kernel io_uring. (REVISED)",
            cwe="CWE-362",
            published="2024-03-15T20:15Z",
            modified="2024-05-02T10:00Z",
            severity_v3="HIGH",
            base_score=7.8,
        ),
        # Genuinely new:
        _item(
            9,
            cpe_uris=["cpe:2.3:o:linux:linux_kernel:6.1:*:*:*:*:*:*:*"],
            description="Use-after-free in linux kernel netfilter.",
            cwe="CWE-416",
            published="2024-05-01T11:15Z",
            modified="2024-05-01T11:15Z",
            severity_v3="HIGH",
            base_score=7.8,
            attack_vector="ADJACENT_NETWORK",
            refsource="CONFIRM",
            n_refs=2,
        ),
        _item(
            10,
            cpe_uris=["cpe:2.3:a:vendor_e:queue:4.4:*:*:*:*:*:*:*"],
            description="Integer overflow in queue length handling.",
            cwe="CWE-190",
            published="2024-05-01T22:15Z",
            modified="2024-05-01T22:15Z",
            severity_v3="MEDIUM",
            base_score=5.9,
            user_interaction="REQUIRED",
            refsource="FULLDISC",
            tags=("Exploit",),
        ),
    ]
    return _feed(items, "2024-05-02T00:00Z")


def main() -> None:
    for name, feed in (
        ("nvdcve-1.1-2024.json.gz", year_feed()),
        ("nvdcve-1.1-recent.json.gz", recent_feed()),
    ):
        path = os.path.join(HERE, name)
        # mtime=0 keeps the gzip bytes deterministic across regenerations
        with gzip.GzipFile(path, "wb", mtime=0) as f:
            f.write(json.dumps(feed, indent=1).encode("utf-8"))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
