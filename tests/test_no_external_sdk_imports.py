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

# module-name prefixes that must never be imported anywhere in the
# package (dotted-prefix match, so any submodule counts): cloud SDKs,
# vendor LLM clients, agent frameworks, and raw HTTP clients — both
# third-party AND the stdlib ones (urllib.request / http.client);
# urllib.parse and friends stay allowed, they do no network IO. All
# network access goes through injected ports with deterministic fakes.
FORBIDDEN_PREFIXES = (
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
    "urllib.request",
    "http.client",
    "socket",
)


def _is_forbidden(dotted: str) -> bool:
    return any(
        dotted == p or dotted.startswith(p + ".") for p in FORBIDDEN_PREFIXES
    )


def _imports(path: pathlib.Path):
    """Every imported dotted name, fully qualified: `import a.b` ->
    'a.b'; `from a.b import c` -> 'a.b.c' (so `from urllib import
    request` and `from urllib.request import urlopen` both resolve
    under the urllib.request prefix)."""
    tree = ast.parse(path.read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                yield alias.name
        elif isinstance(node, ast.ImportFrom) and node.module and node.level == 0:
            for alias in node.names:
                yield f"{node.module}.{alias.name}"


def test_no_forbidden_imports_in_package():
    offenders = []
    for path in sorted(PKG_ROOT.rglob("*.py")):
        for mod in _imports(path):
            if _is_forbidden(mod):
                offenders.append((str(path.relative_to(PKG_ROOT)), mod))
    assert not offenders, offenders


def test_prefix_matcher_covers_stdlib_http_paths():
    assert _is_forbidden("urllib.request")
    assert _is_forbidden("urllib.request.urlopen")
    assert _is_forbidden("http.client.HTTPSConnection")
    assert _is_forbidden("socket")
    assert not _is_forbidden("urllib.parse")
    assert not _is_forbidden("urllib.parse.quote")
    assert not _is_forbidden("hashlib")
