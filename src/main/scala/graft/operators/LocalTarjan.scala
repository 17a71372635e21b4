package graft.operators

import scala.collection.mutable

/** Executor-side exact SCC solve for one small partition of the graph —
  * the "local phase" of the hybrid FW-BW design: the distributed supersteps
  * peel/split the graph (trim, pivot coloring), and any partition whose edge
  * count fits comfortably in one task is finished locally in a single pass
  * instead of burning one Spark job per BFS hop. This is the standard
  * production structure for distributed SCC (FW-BW for the giant component,
  * sequential Tarjan for the long tail of small ones — e.g. Slota et al.,
  * "BFS and Coloring-Based Parallel Algorithms for Strongly Connected
  * Components", IPDPS'14) and is what makes thousands-of-tiny-components
  * graphs cost O(1) jobs instead of O(max component diameter).
  *
  * Iterative (explicit stack) Tarjan — partitions can be long cycles/chains,
  * recursion would blow the task stack. Returns canonical min-member ids.
  */
object LocalTarjan {

  /** SCCs of the subgraph given by `vertexIds` and `edges` (both endpoints
    * must be in `vertexIds`). Returns (id, minMemberOfScc) pairs.
    */
  def solve(vertexIds: Array[Long], edges: Array[(Long, Long)]): Iterator[(Long, Long)] = {
    val adj = mutable.Map[Long, mutable.ArrayBuffer[Long]]()
    edges.foreach { case (s, d) => adj.getOrElseUpdate(s, mutable.ArrayBuffer[Long]()) += d }

    val index = mutable.Map[Long, Int]()
    val low = mutable.Map[Long, Int]()
    val onStack = mutable.Set[Long]()
    val stack = mutable.Stack[Long]()
    var counter = 0
    val out = mutable.ArrayBuffer[(Long, Long)]()
    val empty = mutable.ArrayBuffer.empty[Long]

    for (root <- vertexIds if !index.contains(root)) {
      val work = mutable.Stack[(Long, Int)]((root, 0))
      while (work.nonEmpty) {
        val (v, ci) = work.pop()
        if (ci == 0) {
          index(v) = counter; low(v) = counter; counter += 1
          stack.push(v); onStack += v
        }
        val children = adj.getOrElse(v, empty)
        var i = ci
        var descended = false
        while (i < children.length && !descended) {
          val w = children(i)
          if (!index.contains(w)) {
            work.push((v, i + 1)); work.push((w, 0)); descended = true
          } else {
            if (onStack(w)) low(v) = math.min(low(v), index(w))
            i += 1
          }
        }
        if (!descended) {
          if (low(v) == index(v)) {
            val members = mutable.ArrayBuffer[Long]()
            var w = -1L
            while ({ w = stack.pop(); onStack -= w; members += w; w != v }) ()
            val comp = members.min
            members.foreach(m => out += ((m, comp)))
          }
          if (work.nonEmpty) {
            val (p, _) = work.top
            low(p) = math.min(low(p), low(v))
          }
        }
      }
    }
    out.iterator
  }
}
