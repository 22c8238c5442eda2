package graft.route

import org.scalatest.funsuite.AnyFunSuite

/** Pins the primitive-array Brandes state kernels ([[SrcDistSig]] /
  * [[DeltaVec]]) against the Map-based model they replaced: identical
  * per-source arithmetic (strict-min distance, bit-equal tie σ sums,
  * per-key δ sums) on randomized inputs, plus the structural edge cases
  * the merge-joins must get right (empty identities, disjoint unions,
  * insert-vs-replace in withSelf). RouteSpec gates the end-to-end
  * fixpoint; this spec isolates the kernels so a future refactor cannot
  * break them in a way the small fixtures happen not to exercise.
  */
class BrandesStateSpec extends AnyFunSuite {

  private def ds(entries: (Int, (Double, Double))*): SrcDistSig = {
    val s = entries.sortBy(_._1)
    new SrcDistSig(s.map(_._1).toArray, s.map(_._2._1).toArray, s.map(_._2._2).toArray)
  }
  private def toMap(s: SrcDistSig): Map[Int, (Double, Double)] =
    s.idx.indices.map(i => s.idx(i) -> ((s.dist(i), s.sig(i)))).toMap
  private def dv(entries: (Int, Double)*): DeltaVec = {
    val s = entries.sortBy(_._1)
    new DeltaVec(s.map(_._1).toArray, s.map(_._2).toArray)
  }
  private def toMap(d: DeltaVec): Map[Int, Double] =
    d.idx.indices.map(i => d.idx(i) -> d.del(i)).toMap

  /** the Map-based merge the arrays replaced (Route.scala pre-round-11) */
  private def modelMerge(a: Map[Int, (Double, Double)],
      b: Map[Int, (Double, Double)]): Map[Int, (Double, Double)] =
    (a.keySet ++ b.keySet).iterator.map { k =>
      (a.get(k), b.get(k)) match {
        case (Some(x), None) => k -> x
        case (None, Some(y)) => k -> y
        case (Some(x), Some(y)) =>
          k -> (if (x._1 < y._1) x
                else if (y._1 < x._1) y
                else (x._1, x._2 + y._2))
        case (None, None) => throw new IllegalStateException("unreachable")
      }
    }.toMap

  test("merge: empty is the identity on both sides") {
    val a = ds(3 -> ((1.5, 2.0)), 7 -> ((0.5, 1.0)))
    assert(SrcDistSig.merge(SrcDistSig.empty, a).same(a))
    assert(SrcDistSig.merge(a, SrcDistSig.empty).same(a))
    assert(SrcDistSig.merge(SrcDistSig.empty, SrcDistSig.empty).isEmpty)
  }

  test("merge: disjoint keys interleave sorted; overlaps take strict min; ties sum sigma") {
    val a = ds(1 -> ((5.0, 2.0)), 4 -> ((1.0, 3.0)), 9 -> ((2.0, 1.0)))
    val b = ds(2 -> ((0.5, 1.0)), 4 -> ((1.0, 4.0)), 9 -> ((1.5, 8.0)))
    val m = SrcDistSig.merge(a, b)
    assert(m.idx.toSeq == Seq(1, 2, 4, 9))
    assert(toMap(m) == Map(
      1 -> ((5.0, 2.0)),   // a only
      2 -> ((0.5, 1.0)),   // b only
      4 -> ((1.0, 7.0)),   // bit-equal tie: sigma sums
      9 -> ((1.5, 8.0))))  // strict min: b wins, sigma NOT summed
  }

  test("merge agrees with the Map model on randomized inputs") {
    val rnd = new scala.util.Random(20260816L)
    for (_ <- 1 to 500) {
      def randState(): Seq[(Int, (Double, Double))] = {
        val keys = rnd.shuffle((0 until 64).toList).take(rnd.nextInt(10))
        // draw dists from a small lattice so bit-equal ties actually occur
        keys.map(k => k -> ((rnd.nextInt(4) * 0.25, (rnd.nextInt(5) + 1).toDouble)))
      }
      val ea = randState(); val eb = randState()
      val got = toMap(SrcDistSig.merge(ds(ea: _*), ds(eb: _*)))
      val want = modelMerge(ea.toMap, eb.toMap)
      assert(got == want, s"a=$ea b=$eb")
      // and the result stays idx-sorted (the invariant every consumer relies on)
      val m = SrcDistSig.merge(ds(ea: _*), ds(eb: _*))
      assert(m.idx.toSeq == m.idx.toSeq.sorted)
    }
  }

  test("withSelf replaces an existing entry and inserts at front/middle/back") {
    val base = ds(2 -> ((3.0, 2.0)), 5 -> ((1.0, 1.0)))
    assert(toMap(SrcDistSig.withSelf(base, 5)) ==
      Map(2 -> ((3.0, 2.0)), 5 -> ((0.0, 1.0))))
    assert(toMap(SrcDistSig.withSelf(base, 0)) ==
      Map(0 -> ((0.0, 1.0)), 2 -> ((3.0, 2.0)), 5 -> ((1.0, 1.0))))
    assert(toMap(SrcDistSig.withSelf(base, 3)) ==
      Map(2 -> ((3.0, 2.0)), 3 -> ((0.0, 1.0)), 5 -> ((1.0, 1.0))))
    assert(toMap(SrcDistSig.withSelf(base, 9)) ==
      Map(2 -> ((3.0, 2.0)), 5 -> ((1.0, 1.0)), 9 -> ((0.0, 1.0))))
    assert(toMap(SrcDistSig.withSelf(SrcDistSig.empty, 4)) == Map(4 -> ((0.0, 1.0))))
    // inputs are never mutated (messages may share arrays)
    assert(toMap(base) == Map(2 -> ((3.0, 2.0)), 5 -> ((1.0, 1.0))))
  }

  test("same() is content equality, not reference equality") {
    val a = ds(1 -> ((1.0, 2.0)))
    val b = ds(1 -> ((1.0, 2.0)))
    val c = ds(1 -> ((1.0, 3.0)))
    assert(a.same(b) && !a.same(c) && !a.same(SrcDistSig.empty))
  }

  test("DeltaVec.merge sums per key and keeps sorted order; empty is identity") {
    val a = dv(1 -> 0.5, 4 -> 2.0)
    val b = dv(0 -> 1.0, 4 -> 0.25, 9 -> 3.0)
    val m = DeltaVec.merge(a, b)
    assert(m.idx.toSeq == Seq(0, 1, 4, 9))
    assert(toMap(m) == Map(0 -> 1.0, 1 -> 0.5, 4 -> 2.25, 9 -> 3.0))
    assert(DeltaVec.merge(DeltaVec.empty, a).same(a))
    assert(DeltaVec.merge(a, DeltaVec.empty).same(a))
  }

  test("DeltaVec.minMerge takes per-key minima and keeps sorted order; empty is identity") {
    val a = dv(1 -> 0.5, 4 -> 2.0, 7 -> 1.0)
    val b = dv(0 -> 1.0, 4 -> 0.25, 7 -> 3.0)
    val m = DeltaVec.minMerge(a, b)
    assert(m.idx.toSeq == Seq(0, 1, 4, 7))
    assert(toMap(m) == Map(0 -> 1.0, 1 -> 0.5, 4 -> 0.25, 7 -> 1.0))
    assert(DeltaVec.minMerge(DeltaVec.empty, a).same(a))
    assert(DeltaVec.minMerge(a, DeltaVec.empty).same(a))
  }

  test("DeltaVec.minMerge agrees with the Map-based landmark merge on randomized inputs") {
    val rnd = new scala.util.Random(42L)
    for (_ <- 1 to 500) {
      def randVec(): Seq[(Int, Double)] = {
        val keys = rnd.shuffle((0 until 64).toList).take(rnd.nextInt(10))
        keys.map(k => k -> rnd.nextDouble())
      }
      val ea = randVec(); val eb = randVec()
      val got = toMap(DeltaVec.minMerge(dv(ea: _*), dv(eb: _*)))
      val want = (ea.toMap.keySet ++ eb.toMap.keySet).iterator.map { k =>
        k -> math.min(ea.toMap.getOrElse(k, Double.PositiveInfinity),
          eb.toMap.getOrElse(k, Double.PositiveInfinity))
      }.toMap
      assert(got == want, s"a=$ea b=$eb")
    }
  }

  test("DeltaVec.merge agrees with per-key sums on randomized inputs") {
    val rnd = new scala.util.Random(11L)
    for (_ <- 1 to 500) {
      def randVec(): Seq[(Int, Double)] = {
        val keys = rnd.shuffle((0 until 64).toList).take(rnd.nextInt(10))
        keys.map(k => k -> rnd.nextDouble())
      }
      val ea = randVec(); val eb = randVec()
      val got = toMap(DeltaVec.merge(dv(ea: _*), dv(eb: _*)))
      val want = (ea.toMap.keySet ++ eb.toMap.keySet).iterator.map { k =>
        k -> (ea.toMap.getOrElse(k, 0.0) + eb.toMap.getOrElse(k, 0.0))
      }.toMap
      assert(got == want, s"a=$ea b=$eb")
    }
  }
}
