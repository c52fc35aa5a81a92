package graft.relations

import org.scalatest.funsuite.AnyFunSuite

/** The MoR delete-attachment fold (r18, ADVICE r17): the delete-file
  * lists are a set (a replayed commit that re-attaches the same delete
  * file dedups on the read path), so the manifest's dead-row counts must
  * not re-add a replayed attachment either — otherwise the O(manifest)
  * live-row arithmetic (`requireFreshTermStats`) over-subtracts and
  * false-fails even though the anti-merged read is correct. */
class DeleteAttachmentFoldSpec extends AnyFunSuite {

  test("fresh attachments add both the file and its dead-row count") {
    val (d, r) = CommitLog.foldDeleteAttachments(
      Map.empty, Map.empty,
      Map("data1" -> Seq("del1")), Map("data1" -> 5L))
    assert(d == Map("data1" -> Seq("del1")))
    assert(r == Map("data1" -> 5L))
  }

  test("a replayed attachment dedups the file list AND the row count") {
    val prior = (Map("data1" -> Seq("del1")), Map("data1" -> 5L))
    val (d, r) = CommitLog.foldDeleteAttachments(
      prior._1, prior._2,
      Map("data1" -> Seq("del1")), Map("data1" -> 5L))
    assert(d == Map("data1" -> Seq("del1")), "list stays deduplicated")
    assert(r == Map("data1" -> 5L),
      s"a replay must not double the dead-row count: $r")
  }

  test("a second, genuinely new attachment on the same data file adds") {
    val (d, r) = CommitLog.foldDeleteAttachments(
      Map("data1" -> Seq("del1")), Map("data1" -> 5L),
      Map("data1" -> Seq("del2")), Map("data1" -> 3L))
    assert(d == Map("data1" -> Seq("del1", "del2")))
    assert(r == Map("data1" -> 8L))
  }

  test("independent data files fold independently") {
    val (d, r) = CommitLog.foldDeleteAttachments(
      Map("data1" -> Seq("del1")), Map("data1" -> 5L),
      Map("data1" -> Seq("del1"), "data2" -> Seq("del2")),
      Map("data1" -> 5L, "data2" -> 2L))
    assert(d == Map("data1" -> Seq("del1"), "data2" -> Seq("del2")))
    assert(r == Map("data1" -> 5L, "data2" -> 2L),
      s"replay on data1 skipped, fresh data2 added: $r")
  }
}
