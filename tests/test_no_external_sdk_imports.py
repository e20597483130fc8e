"""Source-scan pin: the package never imports cloud or LLM-vendor SDKs.

The engine re-expresses the reference's behavior in pure PySpark; its
external integrations are PORTS (ports/*.py) with injected fakes, so
no module may import a cloud SDK or a vendor client — at 100 TB the
package runs wherever the cluster runs, with integrations supplied by
the host application. The per-round leak audit checked this by hand
(grep for SDK imports); this test pins it structurally by AST-walking
every import in the package against a denylist, so a convenience
import can't slip in with an operator change.

Pure source scan — no SparkSession, no network.
"""

from __future__ import annotations

import ast
import pathlib

import sbs_suptech_etl_v2_spark as pkg

PKG_ROOT = pathlib.Path(pkg.__file__).parent

# top-level module names that must never be imported anywhere in the
# package (any submodule counts): cloud SDKs, vendor LLM clients,
# agent frameworks, and raw HTTP clients (all network access goes
# through injected ports with deterministic fakes)
FORBIDDEN = {
    "boto3",
    "botocore",
    "awscli",
    "google",
    "azure",
    "langchain",
    "langchain_core",
    "langgraph",
    "anthropic",
    "openai",
    "requests",
    "urllib3",
    "httpx",
    "aiohttp",
}


def _imports(path: pathlib.Path):
    tree = ast.parse(path.read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                yield alias.name.split(".")[0]
        elif isinstance(node, ast.ImportFrom) and node.module and node.level == 0:
            yield node.module.split(".")[0]


def test_no_forbidden_imports_in_package():
    offenders = []
    for path in sorted(PKG_ROOT.rglob("*.py")):
        for mod in _imports(path):
            if mod in FORBIDDEN:
                offenders.append((str(path.relative_to(PKG_ROOT)), mod))
    assert not offenders, offenders
