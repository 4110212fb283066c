package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** SQL-gate matrix ported 1:1 from the reference
  * (reference: tests/test_executor.py:84-174 + FIXTURES.md gate inputs). */
class SqlGateSpec extends AnyFunSuite {

  private def rejected(sql: String, msgPart: String): Unit = {
    val e = intercept[InvalidSqlError](SqlGate.validate(sql))
    assert(e.getMessage.contains(msgPart), s"got: ${e.getMessage}")
  }

  // --- valid statements pass -------------------------------------------
  test("valid SELECT")(SqlGate.validate("SELECT * FROM table1"))
  test("SELECT with WHERE")(SqlGate.validate("SELECT id, name FROM users WHERE id > 10"))
  test("SELECT with JOIN")(SqlGate.validate(
    """
      SELECT u.name, o.total
      FROM users u
      JOIN orders o ON u.id = o.user_id
    """))
  test("SELECT with CTE")(SqlGate.validate(
    """
      WITH active_users AS (
          SELECT * FROM users WHERE active = true
      )
      SELECT * FROM active_users
    """))
  test("EXPLAIN")(SqlGate.validate("EXPLAIN SELECT * FROM users"))
  test("DESCRIBE")(SqlGate.validate("DESCRIBE users"))
  test("SHOW")(SqlGate.validate("SHOW TABLES"))
  test("trailing semicolon allowed")(SqlGate.validate("SELECT 1;"))

  // --- rejections --------------------------------------------------------
  test("empty SQL")(rejected("", "Empty SQL"))
  test("whitespace only")(rejected("   \n\t  ", "Empty SQL"))
  test("multi-statement")(rejected("SELECT 1; DROP TABLE x", "Multiple statements"))
  test("INSERT")(rejected("INSERT INTO users VALUES (1, 'test')", "Write operations"))
  test("UPDATE")(rejected("UPDATE users SET name = 'test' WHERE id = 1", "Write operations"))
  test("DELETE")(rejected("DELETE FROM users WHERE id = 1", "Write operations"))
  test("DROP")(rejected("DROP TABLE users", "Write operations"))
  test("CREATE")(rejected("CREATE TABLE users (id INT)", "Write operations"))
  test("ALTER")(rejected("ALTER TABLE users ADD COLUMN age INT", "Write operations"))
  test("TRUNCATE")(rejected("TRUNCATE TABLE users", "Write operations"))
  test("ATTACH")(rejected("ATTACH DATABASE 'test.db' AS test", "Write operations"))
  test("unknown statement")(rejected("RANDOM STATEMENT HERE", "Only SELECT"))
  test("CTE smuggling")(rejected(
    "WITH x AS (SELECT 1) INSERT INTO t SELECT * FROM x", "Write operations"))
  test("documented false positive: keyword inside a string literal")(
    rejected("SELECT 'DROP TABLE'", "Write operations"))

  // --- exhaustive: every forbidden keyword, three placements ----------------
  test("every forbidden keyword rejected at statement start, mid-query, and in literals") {
    SqlGate.forbiddenKeywords.foreach { k =>
      assert(SqlGate.check(s"$k something").isLeft, s"$k at start")
      assert(SqlGate.check(s"SELECT * FROM t WHERE c = '$k'").isLeft, s"$k in literal")
      assert(SqlGate.check(s"WITH x AS (SELECT 1) $k INTO t SELECT * FROM x").isLeft,
        s"$k after CTE")
      // \b-boundary: keyword embedded inside a longer word is NOT matched
      assert(SqlGate.check(s"SELECT ${k.toLowerCase}ed_col FROM t").isRight,
        s"${k}ed_col should pass the word-boundary scan")
    }
  }

  test("timeout clamp bounds (reference: tests/test_executor.py:298-314)") {
    val cfg = QueryConfig()
    assert(cfg.clampTimeout(None) == 300)
    assert(cfg.clampTimeout(Some(1)) == 10)
    assert(cfg.clampTimeout(Some(10000)) == 3600)
    assert(cfg.clampTimeout(Some(120)) == 120)
    // exhaustive sweep over a wide range: always within [min, max]
    (-100 to 5000 by 7).foreach { t =>
      val c = cfg.clampTimeout(Some(t))
      assert(c >= cfg.minTimeout && c <= cfg.maxTimeout)
    }
  }
}
