"""End-to-end example: the reference's MovieLens walkthrough, Spark-first.

Mirrors ``/root/reference/examples/MoiveLens/script.py:21-130`` —
bulk-load `;`-separated user/movie/rating files, CREATE RECOMMENDER,
then the script's query ladder (single-user RECOMMEND, dimension joins
with ILIKE, ORDER BY ... LIMIT top-k), ending in DROP RECOMMENDER.
The statements run verbatim-shaped through the RecSQL front door; the
data files are synthesized in MovieLens-1M's `;` format (movies.dat:
``id;title;genres`` — the reference ships that exact layout) so the
example is self-contained and deterministic.

Run:  python examples/movielens_example.py [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import SparkSession


def synthesize_dataset(workdir: str, n_users: int = 120, n_movies: int = 60,
                       ratings_per_user: int = 25) -> dict[str, str]:
    """Write users.dat / movies.dat / ratings.dat in the reference's
    `;`-separated COPY format (examples/MoiveLens/users.dat,
    movies.dat). Deterministic: no RNG."""
    genres = ["Action", "Comedy", "Drama", "Action|Thriller",
              "Children's|Comedy", "Sci-Fi|Action"]
    jobs = ["engineer", "artist", "teacher", "doctor"]
    paths = {n: os.path.join(workdir, f"{n}.dat")
             for n in ("users", "movies", "ratings")}
    with open(paths["users"], "w") as f:
        for u in range(1, n_users + 1):
            gender = "MF"[u % 2]
            age = 18 + (u * 7) % 50
            f.write(f"{u};{gender};{age};{jobs[u % 4]};{10000 + u}\n")
    with open(paths["movies"], "w") as f:
        for m in range(1, n_movies + 1):
            f.write(f"{m};Movie {m} ({1990 + m % 20});{genres[m % 6]}\n")
    with open(paths["ratings"], "w") as f:
        for u in range(1, n_users + 1):
            for j in range(ratings_per_user):
                m = (u * 13 + j * 7) % n_movies + 1
                rating = (u * 3 + m * 5) % 5 + 1
                f.write(f"{u};{m};{rating}.0;x\n")
    return paths


def run(spark: SparkSession, workdir: str, verbose: bool = True) -> dict:
    """Load -> CREATE -> query ladder -> DROP; returns the collected
    results keyed by step (for the smoke test)."""
    from recdb_postgresql_spark.engine import RecEngine
    from recdb_postgresql_spark.plans import RecSQL
    from recdb_postgresql_spark.sources.readers import load_csv

    paths = synthesize_dataset(workdir)
    # COPY ... DELIMITERS ';' analog (script.py:52,61,69)
    load_csv(spark, paths["users"],
             "userid int, gender string, age int, job string, zipcode string") \
        .createOrReplaceTempView("users")
    load_csv(spark, paths["movies"],
             "itemid int, name string, genre string") \
        .createOrReplaceTempView("movie")
    load_csv(spark, paths["ratings"],
             "userid int, itemid int, rating double, garbage string") \
        .createOrReplaceTempView("ratings")

    rs = RecSQL(RecEngine(spark))
    results: dict = {}

    def step(name: str, stmt: str):
        out = rs.sql(stmt)
        rows = out.collect() if out is not None else None
        results[name] = rows
        if verbose:
            shown = f"{len(rows)} rows" if rows is not None else "ok"
            print(f"[{name}] {shown}")
        return rows

    # script.py:79 — CREATE RECOMMENDER ... USING ItemCosCF
    step("create", "CREATE RECOMMENDER mlRecItemCos ON ratings "
                   "USERS FROM userid ITEMS FROM itemid "
                   "EVENTS FROM rating USING ItemCosCF")
    # script.py:90 — single-user selection
    step("single_user",
         "SELECT itemid FROM ratings RECOMMEND itemid TO userid ON rating "
         "USING ItemCosCF WHERE userid = 21")
    # script.py:100 — single join + ILIKE genre filter
    step("join_ilike",
         "SELECT r.itemid, i.name, i.genre, r.rating "
         "FROM ratings r, movie i "
         "RECOMMEND r.itemid TO r.userid ON r.rating USING ItemCosCF "
         "WHERE r.itemid = i.itemid AND i.genre ILIKE '%action%' "
         "AND r.userid = 1")
    # script.py:109 — second join adding the users dimension
    step("join_users",
         "SELECT r.itemid, i.name, i.genre, r.rating, r.userid, b.age "
         "FROM ratings r, movie i, users b "
         "RECOMMEND r.itemid TO r.userid ON r.rating USING ItemCosCF "
         "WHERE r.userid = 1 AND r.userid = b.userid "
         "AND r.itemid = i.itemid AND i.genre ILIKE '%action%'")
    # script.py:121 — ORDER BY rating DESC LIMIT 10 (top-k ladder)
    step("topk_10",
         "SELECT r.itemid, i.name, i.genre, r.rating, r.userid, b.age "
         "FROM ratings r, movie i, users b "
         "RECOMMEND r.itemid TO r.userid ON r.rating USING ItemCosCF "
         "WHERE r.userid = 1 AND r.userid = b.userid "
         "AND r.itemid = i.itemid AND i.genre ILIKE '%action%' "
         "ORDER BY rating DESC LIMIT 10")
    # same ladder with JOIN ... ON syntax (round-2 grammar extension)
    step("topk_join_on",
         "SELECT r.itemid, i.name, i.genre, r.rating "
         "FROM ratings r JOIN movie i ON r.itemid = i.itemid "
         "RECOMMEND r.itemid TO r.userid ON r.rating USING ItemCosCF "
         "WHERE r.userid = 1 AND i.genre ILIKE '%action%' "
         "ORDER BY rating DESC LIMIT 10")
    step("drop", "DROP RECOMMENDER mlRecItemCos")
    return results


def main() -> None:
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from recdb_postgresql_spark.engine import get_spark

    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    spark = get_spark("movielens_example")
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, workdir)


if __name__ == "__main__":
    main()
