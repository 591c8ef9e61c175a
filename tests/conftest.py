import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from phenoqc_spark.session import get_spark

    s = get_spark("phenoqc-spark-tests", master="local[4]", extra_conf={
        "spark.sql.shuffle.partitions": "4",
        "spark.ui.enabled": "false",
    })
    yield s
    s.stop()


@pytest.fixture(scope="session")
def onto_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ontologies")
    from phenoqc_spark.fixtures import write_ontology_fixtures

    write_ontology_fixtures(str(d))
    return str(d)


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def resolver(onto_dir):
    from phenoqc_spark.fixtures import fixture_config
    from phenoqc_spark.ontology import TermResolver

    return TermResolver.from_config(fixture_config(onto_dir))
