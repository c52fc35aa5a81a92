package graft.runner

import org.scalatest.funsuite.AnyFunSuite

/** Quote-aware `;;` operation splitting (r18, VERDICT r17 #3): a `;;`
  * inside a string literal, quoted identifier, or comment is part of the
  * statement — only a bare `;;` separates. */
class SplitStatementsSpec extends AnyFunSuite {
  private def split(s: String): Seq[String] =
    Runner.splitStatements(s).map(_.trim).filter(_.nonEmpty)

  test("bare ;; separates statements") {
    assert(split("SELECT 1 ;; SELECT 2") == Seq("SELECT 1", "SELECT 2"))
  }

  test(";; inside a single-quoted literal is not a separator") {
    assert(split("SELECT 'a;;b' ;; SELECT 2") ==
      Seq("SELECT 'a;;b'", "SELECT 2"))
  }

  test(";; inside double quotes and backticks is not a separator") {
    assert(split("""SELECT ";;" FROM `t;;x` ;; SELECT 2""") ==
      Seq("""SELECT ";;" FROM `t;;x`""", "SELECT 2"))
  }

  test("SQL-escaped quote ('') keeps the scanner inside the literal") {
    // '' reads as close-then-reopen: net state is still inside a literal
    assert(split("SELECT 'it''s;;fine' ;; SELECT 2") ==
      Seq("SELECT 'it''s;;fine'", "SELECT 2"))
  }

  test(";; inside comments is not a separator") {
    assert(split("SELECT 1 -- not here ;;\n;; SELECT 2") ==
      Seq("SELECT 1 -- not here ;;", "SELECT 2"))
    assert(split("SELECT 1 /* nor ;; here */ ;; SELECT 2") ==
      Seq("SELECT 1 /* nor ;; here */", "SELECT 2"))
  }

  test("a single ; passes through untouched") {
    assert(split("SELECT 1; SELECT 2") == Seq("SELECT 1; SELECT 2"))
  }

  test("trailing/leading separators yield no empty statements") {
    assert(split(";; SELECT 1 ;;") == Seq("SELECT 1"))
  }
}
