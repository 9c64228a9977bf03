"""Model-based refs-plane sequence test (the tree-model companion in
test_repo_move_validation.py): random branch/tag op sequences against
a dict model.  Pins the full failure algebra in interaction —
branch-exists, branch-missing, main-undeletable, tag-immutable,
tag-tombstone-never-reused (design-docs/006), reset moves tips — and
that a failed op never changes any ref."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings

from tests.conftest import scaled_examples
from hypothesis import strategies as st

from icechunk_spark.repo import RefError, Repository

_BRANCHES = ["dev", "exp"]
_TAGS = ["v1", "v2"]

_op_st = st.one_of(
    st.tuples(st.just("cb"), st.sampled_from(_BRANCHES), st.integers(0, 1)),
    st.tuples(st.just("db"), st.sampled_from(_BRANCHES + ["main"])),
    st.tuples(st.just("rb"), st.sampled_from(_BRANCHES + ["main"]), st.integers(0, 1)),
    st.tuples(st.just("ct"), st.sampled_from(_TAGS), st.integers(0, 1)),
    st.tuples(st.just("dt"), st.sampled_from(_TAGS)),
)


class _Model:
    def __init__(self, snaps):
        self.snaps = snaps  # index -> snapshot id
        self.branches = {"main": snaps[1]}
        self.tags: dict[str, str] = {}
        self.dead_tags: set[str] = set()

    def apply(self, op) -> bool:
        kind = op[0]
        if kind == "cb":
            _, name, i = op
            if name in self.branches:
                return False
            self.branches[name] = self.snaps[i]
            return True
        if kind == "db":
            name = op[1]
            if name == "main" or name not in self.branches:
                return False
            del self.branches[name]
            return True
        if kind == "rb":
            _, name, i = op
            if name not in self.branches:
                return False
            self.branches[name] = self.snaps[i]
            return True
        if kind == "ct":
            _, name, i = op
            if name in self.tags or name in self.dead_tags:
                return False
            self.tags[name] = self.snaps[i]
            return True
        name = op[1]  # dt
        if name not in self.tags:
            return False
        del self.tags[name]
        self.dead_tags.add(name)
        return True


@settings(
    max_examples=scaled_examples(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=st.lists(_op_st, min_size=1, max_size=14))
def test_ref_ops_match_dict_model(spark, tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("refprop"))
    r = Repository.create(spark, root)
    with r.transaction(message="c1") as s:
        s.create_group("/g")
    snaps = [
        [x.id for x in r.ancestry(branch="main")][-1],  # the root snapshot
        r.lookup_branch("main"),
    ]
    model = _Model(snaps)
    for op in ops:
        expect_ok = model.apply(op)
        try:
            if op[0] == "cb":
                r.create_branch(op[1], snaps[op[2]])
            elif op[0] == "db":
                r.delete_branch(op[1])
            elif op[0] == "rb":
                r.reset_branch(op[1], snaps[op[2]])
            elif op[0] == "ct":
                r.create_tag(op[1], snaps[op[2]])
            else:
                r.delete_tag(op[1])
            ok = True
        except RefError:
            ok = False
        assert ok == expect_ok, (op, model.branches, model.tags, model.dead_tags)
        assert {b: r.lookup_branch(b) for b in r.list_branches()} == model.branches
        assert {t: r.lookup_tag(t) for t in r.list_tags()} == model.tags
