package graft.engine

import java.util.regex.Pattern

/** Raised when SQL validation fails
  * (reference: src/iceberg_explorer/query/models.py:113-116). */
final class InvalidSqlError(msg: String) extends Exception(msg)

/**
 * Read-only SQL validation gate — operator A1.
 *
 * Reproduces the reference's semantics exactly
 * (reference: src/iceberg_explorer/query/executor.py:43-116):
 *  1. empty / whitespace-only SQL rejected;
 *  2. a `;` anywhere except trailing rejected (single-statement rule);
 *  3. any of the 21 forbidden write/DDL keywords at a line start rejected;
 *  4. statement must start with WITH/SELECT/EXPLAIN/DESCRIBE/SHOW
 *     (after whitespace-normalization + uppercasing);
 *  5. forbidden keywords ANYWHERE in the normalized text rejected — this
 *     deliberately also rejects `SELECT 'DROP TABLE'` (documented false
 *     positive the reference accepts for safety).
 *
 * This is a pre-parse string gate by design: it must reject before any
 * engine resources are spent, and its behavior is part of the declared
 * API surface (the reference's tests pin these exact messages).
 */
object SqlGate {

  val forbiddenKeywords: Set[String] = Set(
    "INSERT", "UPDATE", "DELETE", "DROP", "CREATE", "ALTER", "TRUNCATE",
    "REPLACE", "MERGE", "UPSERT", "GRANT", "REVOKE", "ATTACH", "DETACH",
    "COPY", "EXPORT", "IMPORT", "VACUUM", "CHECKPOINT", "LOAD", "INSTALL")

  private val kwAlternation = forbiddenKeywords.mkString("|")

  private val forbiddenAtLineStart = Pattern.compile(
    "^\\s*(" + kwAlternation + ")\\b",
    Pattern.CASE_INSENSITIVE | Pattern.MULTILINE)

  private val forbiddenAnywhere = Pattern.compile(
    "\\b(" + kwAlternation + ")\\b", Pattern.CASE_INSENSITIVE)

  private val allowedPrefixes =
    Seq("WITH ", "SELECT ", "EXPLAIN ", "DESCRIBE ", "SHOW ")

  /** @throws InvalidSqlError if the statement is not read-only single-stmt */
  def validate(sql: String): Unit = {
    val stripped = sql.trim
    if (stripped.isEmpty)
      throw new InvalidSqlError("Empty SQL query")

    // single-statement rule: strip trailing semicolons, none may remain
    if (stripped.replaceAll(";+$", "").contains(";"))
      throw new InvalidSqlError("Multiple statements or semicolons are not allowed")

    val atStart = forbiddenAtLineStart.matcher(stripped)
    if (atStart.find())
      throw new InvalidSqlError(
        s"Write operations are not allowed: ${atStart.group(1).toUpperCase}")

    val normalized = stripped.split("\\s+").mkString(" ").toUpperCase
    if (!allowedPrefixes.exists(normalized.startsWith))
      throw new InvalidSqlError(
        "Only SELECT, EXPLAIN, DESCRIBE, and SHOW statements are allowed")

    val anywhere = forbiddenAnywhere.matcher(normalized)
    if (anywhere.find())
      throw new InvalidSqlError(
        s"Write operations are not allowed: ${anywhere.group(1).toUpperCase}")
  }

  /** Non-throwing form: Left(error message) or Right(()). */
  def check(sql: String): Either[String, Unit] =
    try { validate(sql); Right(()) }
    catch { case e: InvalidSqlError => Left(e.getMessage) }
}
