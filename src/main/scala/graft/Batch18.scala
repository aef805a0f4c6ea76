package graft

import graft.SparkEntry.Q
import graft.functions.Similarity
import org.apache.spark.sql.functions._

/** Query registry batch 18 (round 11, fifth session, later waves):
  * both-sides-large k-NN join on shared IVF cells.
  */
private[graft] object Batch18 {

  val queries: Seq[Q] = Seq(

    // k-NN JOIN with both sides corpus-scale (even vec_ids query the odd
    // ones): ONE shared seed-centroid model routes both sides, pairs
    // form cell-locally, exact-decimal cosines rank per query. The
    // oracle re-derives centroid choice (4 smallest corpus ids → cell
    // indexes by id order), every assignment cosine and argmax on BOTH
    // sides, every within-cell pair cosine, and the per-query ranking —
    // the q153 gate design extended to a two-table join.
    Q("q179_knn_join",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val qs = emb.filter(col("vec_id") % 2 === 0)
        val cs = emb.filter(col("vec_id") % 2 === 1)
        val model = Similarity.seedCentroids(cs, "vec_id", "embedding", k = 4)
        Similarity.knnJoinCells(qs, cs, "vec_id", "embedding", model,
            k = 5, exact = true)
          .orderBy("q_id", "rank")
      },
      Some("""WITH e AS (SELECT vec_id AS id,
             |    generate_subscripts(embedding, 1) - 1 AS pos,
             |    CAST(CAST(unnest(embedding) AS DOUBLE) AS DECIMAL(12,9)) AS vd
             |  FROM embeddings),
             |cents AS (SELECT id AS cid,
             |    CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS INTEGER) AS cell
             |  FROM (SELECT DISTINCT id FROM e WHERE id % 2 = 1
             |        ORDER BY id LIMIT 4)),
             |norms AS (SELECT id, sqrt(CAST(SUM(vd * vd) AS DOUBLE)) AS nrm
             |  FROM e GROUP BY 1),
             |cdots AS (SELECT v.id, ct.cell, SUM(v.vd * c.vd) AS dotd
             |  FROM e v JOIN e c ON c.pos = v.pos
             |  JOIN cents ct ON ct.cid = c.id GROUP BY 1, 2),
             |ccos AS (SELECT cdots.id, cdots.cell,
             |    CAST(dotd AS DOUBLE) / (nv.nrm * nc.nrm) AS cos
             |  FROM cdots JOIN norms nv ON nv.id = cdots.id
             |  JOIN cents ct ON ct.cell = cdots.cell
             |  JOIN norms nc ON nc.id = ct.cid),
             |asg AS (SELECT id, cell FROM (
             |    SELECT id, cell, ROW_NUMBER() OVER (
             |      PARTITION BY id ORDER BY cos DESC, cell ASC) AS rn FROM ccos)
             |  WHERE rn = 1),
             |pairs AS (SELECT qa.id AS q_id, ca.id AS c_id, qa.cell
             |  FROM (SELECT * FROM asg WHERE id % 2 = 0) qa
             |  JOIN (SELECT * FROM asg WHERE id % 2 = 1) ca USING (cell)),
             |pdots AS (SELECT p.q_id, p.c_id, p.cell, SUM(x.vd * y.vd) AS dotd
             |  FROM pairs p JOIN e x ON x.id = p.q_id
             |  JOIN e y ON y.id = p.c_id AND y.pos = x.pos GROUP BY 1, 2, 3),
             |scored AS (SELECT q_id, c_id, CAST(cell AS BIGINT) AS cell,
             |    CAST(dotd AS DOUBLE) / (nq.nrm * nc.nrm) AS cos
             |  FROM pdots JOIN norms nq ON nq.id = q_id
             |  JOIN norms nc ON nc.id = c_id)
             |SELECT q_id, c_id, cell, cos, rank FROM (
             |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY q_id
             |    ORDER BY cos DESC, c_id ASC) AS BIGINT) AS rank FROM scored)
             |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin))
  )
}
