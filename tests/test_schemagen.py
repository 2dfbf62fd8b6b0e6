"""GraphQL schema-generation golden parity.

Runs the reference's own schemagen golden corpus
(graphql/schema/testdata/schemagen/ input -> output pairs, the corpus
behind graphql/schema/schemagen_test.go TestSchemaString) through
dgraph_spark.graphql.schemagen.generate_api_schema and requires
byte-for-byte equality; same for the 5-case apollo federation corpus
(testdata/apolloservice/, TestApolloServiceQueryResult).
"""

from __future__ import annotations

import glob
import os

import pytest

_BASE = "/root/reference/graphql/schema/testdata"
_SGEN_IN = f"{_BASE}/schemagen/input"
_SGEN_OUT = f"{_BASE}/schemagen/output"
_APOLLO_IN = f"{_BASE}/apolloservice/input"
_APOLLO_OUT = f"{_BASE}/apolloservice/output"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_SGEN_IN),
    reason="reference schemagen corpus not available")


def _cases(in_dir, out_dir):
    return [os.path.basename(f)
            for f in sorted(glob.glob(os.path.join(in_dir, "*.graphql")))
            if os.path.exists(os.path.join(out_dir, os.path.basename(f)))]


@pytest.mark.parametrize("name", _cases(_SGEN_IN, _SGEN_OUT))
def test_schemagen_golden(name):
    from dgraph_spark.graphql.schemagen import generate_api_schema

    got = generate_api_schema(open(os.path.join(_SGEN_IN, name)).read())
    want = open(os.path.join(_SGEN_OUT, name)).read()
    assert got == want


@pytest.mark.parametrize("name", _cases(_APOLLO_IN, _APOLLO_OUT))
def test_schemagen_apollo_golden(name):
    from dgraph_spark.graphql.schemagen import generate_apollo_service_schema

    got = generate_apollo_service_schema(
        open(os.path.join(_APOLLO_IN, name)).read())
    want = open(os.path.join(_APOLLO_OUT, name)).read()
    assert got == want
