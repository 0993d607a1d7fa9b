package graft.cluster

/** Deterministic union-find over index ids (driver-side clustering of the
  * distinct-surface set). Component representative after `labels` is the
  * MINIMUM member index, matching the distributed CC's min-id contract so
  * the two paths are interchangeable.
  */
final class UnionFind(n: Int) {
  private val parent = Array.tabulate(n)(identity)

  def find(x: Int): Int = {
    var r = x
    while (parent(r) != r) r = parent(r)
    // path compression
    var c = x
    while (parent(c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
    r
  }

  def union(a: Int, b: Int): Unit = {
    val ra = find(a); val rb = find(b)
    if (ra != rb) {
      // min-id wins as root => deterministic representatives
      if (ra < rb) parent(rb) = ra else parent(ra) = rb
    }
  }

  /** label(i) = min index in i's component. */
  def labels: Array[Int] = Array.tabulate(n)(find)
}
