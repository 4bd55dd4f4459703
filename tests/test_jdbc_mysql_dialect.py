"""MySQL-8 JDBC dialect contract (reference src/main.py:17-20 wires a
MySQL connector; the runtime tests in test_jdbc.py use embedded Derby).

No MySQL server exists in the container, so this locks the next layer
down: the exact dialect Spark resolves for a MySQL URL and the DDL type
mapping / identifier quoting it would emit against MySQL 8 when
``write_jdbc`` saves the pipeline's tables. These asserts run the real
JVM ``MySQLDialect`` code — if a Spark upgrade changes the emitted DDL
types, this fails before a production MySQL does.
"""

from __future__ import annotations

import pytest

MYSQL_URL = "jdbc:mysql://localhost:3306/candy_store"


@pytest.fixture(scope="module")
def dialect(spark):
    jvm = spark.sparkContext._jvm
    return jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(MYSQL_URL)


def test_mysql_url_resolves_mysql_dialect(dialect):
    assert "MySQLDialect" in dialect.toString()


def test_identifier_quoting_is_backticks(dialect):
    # MySQL quotes identifiers with backticks, not ANSI double quotes —
    # a table named `order` must survive
    assert dialect.quoteIdentifier("order") == "`order`"


def test_ddl_type_mapping_for_pipeline_schema(spark, dialect):
    """The DDL types Spark emits when creating the pipeline's output
    tables on MySQL 8 (orders summary: ints, decimals, strings, dates)."""
    jvm = spark.sparkContext._jvm
    # Catalyst types are Scala singletons ($ objects) on the JVM side
    singletons = {
        "IntegerType$": "INTEGER",
        "LongType$": "BIGINT",
        "DoubleType$": "DOUBLE PRECISION",
        "StringType$": "LONGTEXT",
        "DateType$": "DATE",
        "BooleanType$": "BIT(1)",
    }
    for name, want in singletons.items():
        dt = getattr(jvm.org.apache.spark.sql.types, name).__getattr__("MODULE$")
        opt = dialect.getJDBCType(dt)
        assert opt.isDefined(), f"no MySQL mapping for {name}"
        assert opt.get().databaseTypeDefinition() == want, name


def test_decimal_money_maps_to_exact_decimal(spark, dialect):
    # money columns ride DECIMAL(12,2) through the pipeline; on MySQL
    # they must land as exact DECIMAL, never floating point
    jvm = spark.sparkContext._jvm
    dec = jvm.org.apache.spark.sql.types.DecimalType(12, 2)
    opt = dialect.getJDBCType(dec)
    assert opt.isDefined()
    assert opt.get().databaseTypeDefinition() == "DECIMAL(12,2)"
