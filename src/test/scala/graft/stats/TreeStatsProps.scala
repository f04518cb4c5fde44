package graft.stats

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the tree-statistics operator (pure local —
  * processGroup needs no SparkSession, so these run thousands of cases
  * cheaply). Forests are generated with mixed edge types, cross-links
  * and occasional missing parents, mirroring real ingest output.
  */
object TreeStatsProps extends Properties("TreeStats") {

  private val genForest: Gen[List[TreeInput]] =
    Gen.choose(1, 40).flatMap { n =>
      Gen.sequence[List[TreeInput], TreeInput]((1 to n).toList.map { i =>
        for {
          hasParent <- Gen.frequency(8 -> true, 2 -> false)
          parent <- if (i > 1 && hasParent) Gen.choose(1L, (i - 1).toLong).map(Some(_))
                    else Gen.frequency[Option[Long]](9 -> None, 1 -> Gen.choose(900L, 905L).map(Some(_)))
          kind <- Gen.choose(0, 2)
          author <- Gen.choose(0L, 6L)
          r <- Gen.choose(0L, 4L); q <- Gen.choose(0L, 4L)
          l <- Gen.choose(0L, 4L); rt <- Gen.choose(0L, 4L)
        } yield TreeInput(i.toLong, author,
          if (kind == 0) parent else None,
          if (kind == 1) parent else None,
          if (kind == 2) parent else None,
          r, q, l, rt, group_id = 1L)
      })
    }

  private def close(a: Double, b: Double): Boolean =
    math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b))

  property("matches the naive recursive implementation") = forAll(genForest) { rows =>
    val got = TreeStats.processGroup(rows.iterator).map(r => r.tweet_id -> r).toMap
    val want = NaiveTreeStats.compute(rows)
    got.keySet == want.keySet && got.keySet.forall { id =>
      got(id).productIterator.zip(want(id).productIterator).forall {
        case (a: Double, b: Double) => close(a, b)
        case (a, b) => a == b
      }
    }
  }

  property("reference invariants: leaf_descendants <= descendants <= group size") =
    forAll(genForest) { rows =>
      val out = TreeStats.processGroup(rows.iterator).toSeq
      out.forall(s => s.leaf_descendants <= s.descendants && s.descendants < rows.size + 1) &&
        out.forall(s => s.ur_leaf_descendants <= s.ur_descendants)
    }

  property("emits exactly one row per input tweet") = forAll(genForest) { rows =>
    TreeStats.processGroup(rows.iterator).map(_.tweet_id).toSet == rows.map(_.tweet_id).toSet
  }

  property("idempotent: recomputing a group gives identical rows") = forAll(genForest) { rows =>
    val a = TreeStats.processGroup(rows.iterator).toSeq
    val b = TreeStats.processGroup(rows.iterator).toSeq
    a == b
  }
}
