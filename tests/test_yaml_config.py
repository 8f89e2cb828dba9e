"""End-to-end from a YAML config file (the reference's front door,
config_reader.rs:88-111), including the Inline action registry."""

import textwrap

from reactivedb_spark import Engine


def test_engine_from_yaml_file_with_action_registry(spark, tmp_path, workspace):
    (tmp_path / "my_actions.py").write_text(
        "def halve(row):\n    row['v'] = row['v'] / 2\n    return row\n"
    )
    cfg = tmp_path / "db.yaml"
    cfg.write_text(textwrap.dedent(f"""
        tables:
          - Source:
              name: readings
              columns:
                sensor: Str
                v: Integer
          - Derived:
              name: halved
              transform_definition:
                ActionTransform:
                  name: Halve
                  source_table: readings
          - Derived:
              name: hot
              transform_definition:
                FilterTransform:
                  source_table: readings
                  filter: v > 100
        storage_destination: unused/
        action_config:
          Inline:
            workspace_dir: "{tmp_path}"
            actions:
              - name: Halve
                file: my_actions
                function: halve
    """))
    import sys

    sys.path.insert(0, str(tmp_path))
    try:
        eng = Engine(spark, str(cfg), workspace=workspace)
        eng.insert("readings", [{"sensor": "a", "v": 300}, {"sensor": "b", "v": 50}])
        halved = {r["sensor"]: r["v"] for r in eng.table("halved").collect()}
        assert halved == {"a": 150, "b": 25}
        assert [r["sensor"] for r in eng.table("hot").collect()] == ["a"]
    finally:
        sys.path.remove(str(tmp_path))


def test_union_three_parents(spark, workspace):
    cfg = {
        "tables": [
            {"Source": {"name": "a", "columns": {"k": "Str", "x": "Integer"}}},
            {"Source": {"name": "b", "columns": {"k": "Str", "y": "Integer"}}},
            {"Source": {"name": "c", "columns": {"k": "Str", "z": "Integer"}}},
            {"Derived": {"name": "u",
                         "transform_definition": {"UnionTransform": {
                             "tables_and_foreign_keys": [["a", "k"], ["b", "k"], ["c", "k"]]}}}},
        ]
    }
    eng = Engine(spark, cfg, workspace=workspace)
    eng.insert("a", [{"k": "m", "x": 1}])
    eng.insert("b", [{"k": "m", "y": 2}])
    eng.insert("c", [{"k": "m", "z": 3}, {"k": "n", "z": 9}])
    rows = {r["matchingKey"]: r.asDict() for r in eng.table("u").collect()}
    assert rows["m"]["x"] == 1 and rows["m"]["y"] == 2 and rows["m"]["z"] == 3
    assert rows["n"]["z"] == 9 and rows["n"]["x"] is None


def test_yaml_join_transform(spark, tmp_path):
    """JoinTransform parses from the YAML surface like every other
    transform kind."""
    import textwrap

    from reactivedb_spark.config import JoinTransformConfig, load_config

    y = tmp_path / "join.yaml"
    y.write_text(textwrap.dedent("""\
        tables:
          - Source:
              name: ord
              columns: {okey: Integer, ckey: Integer}
          - Source:
              name: cust
              columns: {cust_id: Integer, cname: Str}
          - Derived:
              name: joined
              transform_definition:
                JoinTransform:
                  left_table: ord
                  right_table: cust
                  left_on: ckey
                  right_on: cust_id
    """))
    cfg = load_config(str(y))
    (j,) = [d for d in cfg.derived if d.name == "joined"]
    assert isinstance(j.transform, JoinTransformConfig)
    assert j.transform.left_on == "ckey" and j.transform.right_on == "cust_id"


def test_yaml_topk_transform(spark, tmp_path):
    """TopKTransform parses from the YAML surface like every other
    transform kind; descending defaults to true."""
    import textwrap

    from reactivedb_spark.config import TopKTransformConfig, load_config

    y = tmp_path / "topk.yaml"
    y.write_text(textwrap.dedent("""\
        tables:
          - Source:
              name: scores
              columns: {player: Integer, team: Str, points: Integer}
          - Derived:
              name: leaders
              transform_definition:
                TopKTransform:
                  source_table: scores
                  group_by: team
                  order_by: points
                  k: 3
    """))
    cfg = load_config(str(y))
    (t,) = [d for d in cfg.derived if d.name == "leaders"]
    assert isinstance(t.transform, TopKTransformConfig)
    assert t.transform.k == 3 and t.transform.descending is True


def test_yaml_distinct_transform(spark, tmp_path):
    """DistinctTransform parses from the YAML surface; columns keep
    declaration order (tuple identity is order-sensitive)."""
    import textwrap

    from reactivedb_spark.config import DistinctTransformConfig, load_config

    y = tmp_path / "distinct.yaml"
    y.write_text(textwrap.dedent("""\
        tables:
          - Source:
              name: ev
              columns: {uid: Integer, etype: Str}
          - Derived:
              name: pairs
              transform_definition:
                DistinctTransform:
                  source_table: ev
                  columns: [uid, etype]
    """))
    cfg = load_config(str(y))
    (t,) = [d for d in cfg.derived if d.name == "pairs"]
    assert isinstance(t.transform, DistinctTransformConfig)
    assert t.transform.columns == ("uid", "etype")
