package graft.graph

import org.apache.spark.graphx._

/** G3: score-attenuated label propagation (Leung et al. 2009, "Towards
  * real-time community detection in large networks" — the algorithm
  * behind Flink Gelly's CommunityDetection library, which the reference
  * invokes at ScipiBatchCommunity.java:210 with iterations=10,
  * delta=0.5).
  *
  * Semantics implemented (Gelly-compatible):
  *  - vertex state (label: Long, score: Double), seeded label = vertex
  *    id (unique), score = 1.0;
  *  - each superstep a vertex sends (label, score × edgeWeight) to every
  *    neighbor (both directions — the reference graph is logically
  *    undirected);
  *  - a vertex aggregates received scores per label, adopts the argmax
  *    label (ties broken toward the smaller label for determinism), and
  *    attenuates: newScore = maxAggScore − delta/2;
  *  - runs exactly `iterations` supersteps (fixed-point not required —
  *    matches Gelly's IterationConfiguration).
  *
  * `graphx.lib.LabelPropagation` is NOT this algorithm (no score, no
  * attenuation) — hence the custom Pregel.
  *
  * Scale: Pregel here is iterative aggregateMessages — per superstep one
  * shuffle of (label, score) pairs, O(E) messages. EdgePartition2D on
  * the input graph bounds replication to 2√P copies per vertex.
  */
object CommunityDetection {

  def run(
      graph: Graph[Long, Double],
      iterations: Int = 10,
      delta: Double = 0.5): Graph[Long, Double] = {

    // state: (label, score); messages: Map[label -> summed score]
    val seeded: Graph[(Long, Double), Double] =
      graph.mapVertices((id, _) => (id, 1.0))

    val initial = Map.empty[Long, Double]

    def vprog(id: VertexId, state: (Long, Double), msgs: Map[Long, Double]): (Long, Double) =
      if (msgs.isEmpty) state
      else {
        // argmax score, ties to the smaller label (deterministic)
        val (bestLabel, bestScore) = msgs.minBy { case (l, s) => (-s, l) }
        (bestLabel, bestScore - delta / 2.0)
      }

    def sendMsg(t: EdgeTriplet[(Long, Double), Double]): Iterator[(VertexId, Map[Long, Double])] = {
      val (sl, ss) = t.srcAttr
      val (dl, ds) = t.dstAttr
      Iterator(
        (t.dstId, Map(sl -> ss * t.attr)),
        (t.srcId, Map(dl -> ds * t.attr)))
    }

    def merge(a: Map[Long, Double], b: Map[Long, Double]): Map[Long, Double] =
      b.foldLeft(a) { case (acc, (l, s)) => acc.updated(l, acc.getOrElse(l, 0.0) + s) }

    val result = Pregel(
      seeded, initial,
      maxIterations = iterations,
      activeDirection = EdgeDirection.Either)(vprog, sendMsg, merge)

    result.mapVertices((_, state) => state._1)
  }

  /** G4: induced subgraph on a set of (dense) labels
    * (ScipiBatchCommunity.java:256-262). */
  def subgraphByLabels(labeled: Graph[Long, Double], keep: Set[Long]): Graph[Long, Double] =
    labeled.subgraph(vpred = (_, label) => keep.contains(label))
}
