"""Tokenizer + recursive-descent parser for the Cypher subset.

Grammar (the shape observed across the reference's query corpus —
trial_balance.py, fact_query.py, save_view.py, the demo suites and
mcp example queries):

  query       := select_query (UNION ALL select_query)*
  select_query:= clause* return_clause tail*
  clause      := (OPTIONAL)? MATCH pattern (',' pattern)*
               | WHERE expr
               | WITH (DISTINCT)? items (WHERE expr)?
               | UNWIND expr AS name
  return      := RETURN (DISTINCT)? items
  tail        := ORDER BY order_item (',' order_item)* | SKIP n | LIMIT n
  pattern     := node (edge node)*
  node        := '(' var? (':' Label)? props? ')'
  edge        := '-[' var? (':' TYPE)? ']->' | '<-[' ... ']-'
               | '-[' ... ']-' | '--' | '-->' | '<--'
  expr        := OR/AND/NOT over comparisons over additive terms;
                 terms: literal, $param, var.prop, var, function call,
                 CASE WHEN, parenthesized expr, list literal
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

KEYWORDS = {
    "MATCH", "OPTIONAL", "WHERE", "WITH", "RETURN", "ORDER", "BY", "SKIP",
    "LIMIT", "DISTINCT", "UNION", "ALL", "AND", "OR", "NOT", "IN", "CONTAINS",
    "STARTS", "ENDS", "IS", "NULL", "AS", "CASE", "WHEN", "THEN", "ELSE",
    "END", "ASC", "DESC", "TRUE", "FALSE", "UNWIND",
    "CREATE", "MERGE", "SET", "DELETE", "DETACH",
}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>//[^\n]*|/\*.*?\*/)
  | (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<number>\d+\.\d+|\d+)
  | (?P<param>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<name>`[^`]+`|[A-Za-z_][A-Za-z0-9_]*)
  | (?P<arrow><-\[|\]->|-\[|\]-|<--|-->|--)
  | (?P<op><>|<=|>=|=~|\+=|[()\[\]{},.:;=<>+\-*/%|])
    """,
    re.VERBOSE | re.DOTALL,
)


@dataclass
class Token:
    kind: str  # KEYWORD NAME STRING NUMBER PARAM ARROW OP EOF
    value: str
    pos: int
    raw: str = ""  # original text (keywords store uppercased value)


def tokenize(text: str) -> list[Token]:
    out: list[Token] = []
    i = 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise CypherSyntaxError(f"Unexpected character {text[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        val = m.group()
        if kind in ("ws", "comment"):
            continue
        if kind == "name":
            name = val.strip("`")
            if name.upper() in KEYWORDS and not val.startswith("`"):
                out.append(Token("KEYWORD", name.upper(), m.start(), name))
            else:
                out.append(Token("NAME", name, m.start(), name))
        elif kind == "string":
            out.append(Token("STRING", val[1:-1], m.start()))
        elif kind == "number":
            out.append(Token("NUMBER", val, m.start()))
        elif kind == "param":
            out.append(Token("PARAM", val[1:], m.start()))
        elif kind == "arrow":
            out.append(Token("ARROW", val, m.start()))
        else:
            out.append(Token("OP", val, m.start()))
    out.append(Token("EOF", "", len(text)))
    return out


class CypherSyntaxError(ValueError):
    pass


# --------------------------------------------------------------------------
# AST
# --------------------------------------------------------------------------

@dataclass
class NodePattern:
    var: str | None
    label: str | None
    props: dict = field(default_factory=dict)


@dataclass
class EdgePattern:
    var: str | None
    rel_type: str | None
    direction: str  # 'out' | 'in' | 'undirected'
    min_hops: int | None = None  # var-length [*min..max]; None = single hop
    max_hops: int | None = None


@dataclass
class PathPattern:
    elements: list  # NodePattern, EdgePattern alternating
    # ``p = shortestPath((a)-[:R*1..4]->(b))`` surface (the reference's
    # analyzer recognizes and cost-flags these forms,
    # middleware/graph/execution_strategies.py:86-88):
    path_var: str | None = None  # bound path variable (length(p))
    shortest: str | None = None  # None | 'shortest' | 'all'


@dataclass
class MatchClause:
    patterns: list[PathPattern]
    optional: bool = False
    where: "Expr | None" = None


@dataclass
class UnwindClause:
    expr: "Expr"
    alias: str


@dataclass
class CreateClause:
    """CREATE (n:Label {props}) / CREATE (a)-[:R]->(b) — the write
    shapes of the reference's save_view.py:154-243."""

    patterns: list["PathPattern"]


@dataclass
class MergeClause:
    """MERGE (n:Label {key: $v}) — node upsert — or
    MERGE (a)-[:R]->(b) between bound variables (the reference's
    connection-link idiom, operations/connection_service.py)."""

    pattern: "PathPattern"


@dataclass
class SetClause:
    """SET n.prop = expr, ... (save_view.py:191-195)."""

    assignments: list  # list[tuple[PropRef, Expr]]


@dataclass
class DeleteClause:
    """[DETACH] DELETE var, ... (save_view.py:121-128)."""

    variables: list[str]
    detach: bool = False


@dataclass
class ProjectionItem:
    expr: "Expr"
    alias: str | None


@dataclass
class WithClause:
    items: list[ProjectionItem]
    distinct: bool = False
    where: "Expr | None" = None


@dataclass
class ReturnClause:
    items: list[ProjectionItem]
    distinct: bool = False


@dataclass
class OrderItem:
    expr: "Expr"
    desc: bool = False


@dataclass
class SingleQuery:
    clauses: list  # MatchClause | WithClause | UnwindClause | write clauses
    returns: "ReturnClause | None"
    order_by: list[OrderItem] = field(default_factory=list)
    skip: "int | Param | None" = None
    limit: "int | Param | None" = None


@dataclass
class UnionQuery:
    queries: list[SingleQuery]
    union_all: bool = True


# Expressions
@dataclass
class Literal:
    value: object


@dataclass
class Param:
    name: str


@dataclass
class VarRef:
    name: str


@dataclass
class PropRef:
    var: str
    prop: str


@dataclass
class BinaryOp:
    op: str
    left: "Expr"
    right: "Expr"


@dataclass
class UnaryOp:
    op: str  # 'NOT' | '-'
    operand: "Expr"


@dataclass
class IsNull:
    operand: "Expr"
    negated: bool = False


@dataclass
class FuncCall:
    name: str
    args: list
    distinct: bool = False


@dataclass
class CaseExpr:
    whens: list[tuple]
    default: "Expr | None"


@dataclass
class ListLiteral:
    items: list


@dataclass
class Subscript:
    """``expr[index]`` — list index (0-based, negative from end, the
    ``labels(n)[0]`` idiom in examples/accounting_demo/
    05_query_graph.py:45) or map/struct key lookup."""

    target: "Expr"
    index: "Expr"


@dataclass
class MapLiteral:
    """``{key: expr, ...}`` map projection (the collect({...}) idiom
    in the reference's view queries, e.g. operations/views/
    element_mapping.py:42-50)."""

    entries: list  # list[tuple[str, Expr]]


Expr = object


class Parser:
    def __init__(self, tokens: list[Token]):
        self.toks = tokens
        self.i = 0

    # -- helpers ----------------------------------------------------------
    def peek(self, offset: int = 0) -> Token:
        return self.toks[min(self.i + offset, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_keyword(self, *kws: str) -> bool:
        t = self.peek()
        return t.kind == "KEYWORD" and t.value in kws

    def expect_keyword(self, kw: str) -> Token:
        t = self.next()
        if t.kind != "KEYWORD" or t.value != kw:
            raise CypherSyntaxError(f"Expected {kw}, got {t.value!r} at {t.pos}")
        return t

    def expect_op(self, op: str) -> Token:
        t = self.next()
        if t.value != op:
            raise CypherSyntaxError(f"Expected {op!r}, got {t.value!r} at {t.pos}")
        return t

    def accept_op(self, op: str) -> bool:
        if self.peek().kind in ("OP", "ARROW") and self.peek().value == op:
            self.next()
            return True
        return False

    def parse_name(self) -> str:
        """A name position: NAME, or a KEYWORD used as an identifier
        (labels/aliases like ``Order`` or ``end`` collide with keywords)."""
        t = self.next()
        if t.kind == "NAME":
            return t.value
        if t.kind == "KEYWORD":
            return t.raw or t.value
        raise CypherSyntaxError(f"Expected a name, got {t.value!r} at {t.pos}")

    # -- top level --------------------------------------------------------
    def parse(self) -> UnionQuery:
        queries = [self.parse_single()]
        union_all: bool | None = None
        while self.at_keyword("UNION"):
            self.next()
            this_all = self.at_keyword("ALL")
            if this_all:
                self.next()
            if union_all is not None and union_all != this_all:
                # Neo4j rejects mixed UNION / UNION ALL too
                raise CypherSyntaxError("Cannot mix UNION and UNION ALL")
            union_all = this_all
            queries.append(self.parse_single())
        # tolerate a trailing statement terminator (MCP clients send them)
        while self.peek().kind == "OP" and self.peek().value == ";":
            self.next()
        if self.peek().kind != "EOF":
            t = self.peek()
            raise CypherSyntaxError(f"Unexpected trailing input {t.value!r} at {t.pos}")
        return UnionQuery(queries=queries, union_all=union_all in (None, True))

    def parse_single(self) -> SingleQuery:
        clauses: list = []
        returns: ReturnClause | None = None
        while True:
            if self.at_keyword("MATCH", "OPTIONAL"):
                clauses.append(self.parse_match())
            elif self.at_keyword("UNWIND"):
                self.next()
                expr = self.parse_expr()
                self.expect_keyword("AS")
                alias = self.parse_name()
                clauses.append(UnwindClause(expr, alias))
            elif self.at_keyword("WHERE"):
                self.next()
                cond = self.parse_expr()
                # attach to the most recent MATCH/WITH clause
                if clauses and isinstance(clauses[-1], (MatchClause, WithClause)):
                    clauses[-1].where = (
                        cond
                        if clauses[-1].where is None
                        else BinaryOp("AND", clauses[-1].where, cond)
                    )
                else:
                    raise CypherSyntaxError("WHERE without a preceding MATCH/WITH")
            elif self.at_keyword("WITH"):
                self.next()
                distinct = False
                if self.at_keyword("DISTINCT"):
                    self.next()
                    distinct = True
                items = self.parse_items()
                clauses.append(WithClause(items=items, distinct=distinct))
            elif self.at_keyword("CREATE"):
                self.next()
                patterns = [self.parse_path()]
                while self.accept_op(","):
                    patterns.append(self.parse_path())
                clauses.append(CreateClause(patterns))
            elif self.at_keyword("MERGE"):
                self.next()
                clauses.append(MergeClause(self.parse_path()))
            elif self.at_keyword("SET"):
                self.next()
                assignments = []
                while True:
                    # target parsed token-wise: parse_expr would eat the
                    # '=' as a comparison operator
                    var = self.parse_name()
                    if self.accept_op("+="):
                        # SET n += map — merge properties from a map
                        # (the neo4j.py:340 batch-upsert idiom)
                        assignments.append((VarRef(var), self.parse_expr()))
                    else:
                        self.expect_op(".")
                        prop = self.parse_name()
                        self.expect_op("=")
                        assignments.append((PropRef(var, prop), self.parse_expr()))
                    if not self.accept_op(","):
                        break
                clauses.append(SetClause(assignments))
            elif self.at_keyword("DELETE", "DETACH"):
                detach = False
                if self.at_keyword("DETACH"):
                    self.next()
                    detach = True
                self.expect_keyword("DELETE")
                variables = [self.parse_name()]
                while self.accept_op(","):
                    variables.append(self.parse_name())
                clauses.append(DeleteClause(variables, detach))
            elif self.at_keyword("RETURN"):
                self.next()
                distinct = False
                if self.at_keyword("DISTINCT"):
                    self.next()
                    distinct = True
                returns = ReturnClause(items=self.parse_items(), distinct=distinct)
                break
            elif self.peek().kind == "EOF" and any(
                isinstance(c, (CreateClause, MergeClause, SetClause, DeleteClause))
                for c in clauses
            ):
                # write statements may omit RETURN
                break
            else:
                t = self.peek()
                raise CypherSyntaxError(f"Unexpected token {t.value!r} at {t.pos}")
        order_by: list[OrderItem] = []
        skip = limit = None
        while True:
            if self.at_keyword("ORDER"):
                self.next()
                self.expect_keyword("BY")
                while True:
                    e = self.parse_expr()
                    desc = False
                    if self.at_keyword("ASC"):
                        self.next()
                    elif self.at_keyword("DESC"):
                        self.next()
                        desc = True
                    order_by.append(OrderItem(e, desc))
                    if not self.accept_op(","):
                        break
            elif self.at_keyword("SKIP"):
                self.next()
                skip = self._limit_value()
            elif self.at_keyword("LIMIT"):
                self.next()
                limit = self._limit_value()
            else:
                break
        return SingleQuery(clauses, returns, order_by, skip, limit)

    def _limit_value(self) -> "int | Param":
        """LIMIT/SKIP operand: an integer literal or a parameter
        (the reference's MCP/API corpus binds ``LIMIT $limit``,
        e.g. models/api/graphs/query.py)."""
        t = self.next()
        if t.kind == "PARAM":
            return Param(t.value)
        if t.kind == "NUMBER" and "." not in t.value:
            return int(t.value)
        raise CypherSyntaxError(
            f"Expected integer or parameter after LIMIT/SKIP at {t.pos}"
        )

    def parse_items(self) -> list[ProjectionItem]:
        items = []
        while True:
            expr = self.parse_expr()
            alias = None
            if self.at_keyword("AS"):
                self.next()
                alias = self.parse_name()
            items.append(ProjectionItem(expr, alias))
            if not self.accept_op(","):
                break
        return items

    # -- patterns ---------------------------------------------------------
    def parse_match(self) -> MatchClause:
        optional = False
        if self.at_keyword("OPTIONAL"):
            self.next()
            optional = True
        self.expect_keyword("MATCH")
        patterns = [self.parse_pattern_part()]
        while self.accept_op(","):
            patterns.append(self.parse_pattern_part())
        return MatchClause(patterns=patterns, optional=optional)

    def parse_pattern_part(self) -> PathPattern:
        """One MATCH pattern, optionally ``p = shortestPath(...)`` /
        ``p = allShortestPaths(...)`` (Neo4j surface; the reference's
        analyzer cost-flags both forms).  A node pattern always starts
        with '(', so NAME '=' is unambiguously a path binding."""
        path_var = None
        if self.peek().kind == "NAME" and self.peek(1).value == "=":
            path_var = self.next().value
            self.next()  # '='
        shortest = None
        if (
            self.peek().kind == "NAME"
            and self.peek().value.lower() in ("shortestpath", "allshortestpaths")
        ):
            shortest = (
                "all"
                if self.peek().value.lower().startswith("all")
                else "shortest"
            )
            self.next()
            self.expect_op("(")
            path = self.parse_path()
            self.expect_op(")")
        else:
            path = self.parse_path()
        path.path_var = path_var
        path.shortest = shortest
        return path

    def parse_path(self) -> PathPattern:
        elements: list = [self.parse_node()]
        while self.peek().kind == "ARROW":
            elements.append(self.parse_edge())
            elements.append(self.parse_node())
        return PathPattern(elements)

    def parse_node(self) -> NodePattern:
        self.expect_op("(")
        var = label = None
        props: dict = {}
        if self.peek().kind == "NAME":
            var = self.next().value
        if self.accept_op(":"):
            label = self.parse_name()
        if self.peek().value == "{":
            self.next()
            while self.peek().value != "}":
                key = self.next().value
                self.expect_op(":")
                props[key] = self.parse_expr()
                if not self.accept_op(","):
                    break
            self.expect_op("}")
        self.expect_op(")")
        return NodePattern(var, label, props)

    def parse_edge(self) -> EdgePattern:
        t = self.next()
        if t.value == "--":
            return EdgePattern(None, None, "undirected")
        if t.value == "-->":
            return EdgePattern(None, None, "out")
        if t.value == "<--":
            return EdgePattern(None, None, "in")
        if t.value in ("-[", "<-["):
            incoming = t.value == "<-["
            var = rel = None
            min_hops = max_hops = None
            if self.peek().kind == "NAME":
                var = self.next().value
            if self.accept_op(":"):
                rel = self.parse_name()
            if self.accept_op("*"):
                # var-length: *  |  *N  |  *..N  |  *N..M  (validator
                # grammar, query_validator.py:33-43)
                min_hops, max_hops = 1, None
                if self.peek().kind == "NUMBER":
                    min_hops = int(self.next().value)
                    max_hops = min_hops
                if self.peek().value == "." and self.peek(1).value == ".":
                    self.next(), self.next()
                    max_hops = None
                    if self.peek().kind == "NUMBER":
                        max_hops = int(self.next().value)
            closer = self.next()
            if closer.value == "]->":
                if incoming:
                    raise CypherSyntaxError("Edge cannot be both <-[ and ]->")
                return EdgePattern(var, rel, "out", min_hops, max_hops)
            if closer.value == "]-":
                return EdgePattern(var, rel, "in" if incoming else "undirected", min_hops, max_hops)
            raise CypherSyntaxError(f"Bad edge close {closer.value!r} at {closer.pos}")
        raise CypherSyntaxError(f"Bad edge start {t.value!r} at {t.pos}")

    # -- expressions ------------------------------------------------------
    def parse_expr(self):
        return self.parse_or()

    def parse_or(self):
        left = self.parse_and()
        while self.at_keyword("OR"):
            self.next()
            left = BinaryOp("OR", left, self.parse_and())
        return left

    def parse_and(self):
        left = self.parse_not()
        while self.at_keyword("AND"):
            self.next()
            left = BinaryOp("AND", left, self.parse_not())
        return left

    def parse_not(self):
        if self.at_keyword("NOT"):
            self.next()
            return UnaryOp("NOT", self.parse_not())
        return self.parse_comparison()

    def parse_comparison(self):
        left = self.parse_additive()
        t = self.peek()
        if t.kind == "OP" and t.value in ("=", "<>", "<", "<=", ">", ">="):
            self.next()
            return BinaryOp(t.value, left, self.parse_additive())
        if self.at_keyword("IN"):
            self.next()
            return BinaryOp("IN", left, self.parse_additive())
        if self.at_keyword("CONTAINS"):
            self.next()
            return BinaryOp("CONTAINS", left, self.parse_additive())
        if self.at_keyword("STARTS"):
            self.next()
            self.expect_keyword("WITH")
            return BinaryOp("STARTS WITH", left, self.parse_additive())
        if self.at_keyword("ENDS"):
            self.next()
            self.expect_keyword("WITH")
            return BinaryOp("ENDS WITH", left, self.parse_additive())
        if self.at_keyword("IS"):
            self.next()
            negated = False
            if self.at_keyword("NOT"):
                self.next()
                negated = True
            self.expect_keyword("NULL")
            return IsNull(left, negated)
        return left

    def parse_additive(self):
        left = self.parse_multiplicative()
        while self.peek().kind == "OP" and self.peek().value in ("+", "-"):
            op = self.next().value
            left = BinaryOp(op, left, self.parse_multiplicative())
        return left

    def parse_multiplicative(self):
        left = self.parse_unary()
        while self.peek().kind == "OP" and self.peek().value in ("*", "/", "%"):
            op = self.next().value
            left = BinaryOp(op, left, self.parse_unary())
        return left

    def parse_unary(self):
        if self.peek().kind == "OP" and self.peek().value == "-":
            self.next()
            return UnaryOp("-", self.parse_unary())
        return self.parse_postfix()

    def parse_postfix(self):
        e = self.parse_primary()
        while self.peek().kind == "OP" and self.peek().value in (".", "["):
            if self.accept_op("["):
                e = Subscript(e, self.parse_expr())
                self.expect_op("]")
                continue
            self.next()
            prop = self.parse_name()
            if isinstance(e, VarRef):
                e = PropRef(e.name, prop)
            else:
                raise CypherSyntaxError("Property access only on variables")
        return e

    def parse_primary(self):
        t = self.peek()
        if t.kind == "STRING":
            self.next()
            return Literal(t.value)
        if t.kind == "NUMBER":
            self.next()
            return Literal(float(t.value) if "." in t.value else int(t.value))
        if t.kind == "PARAM":
            self.next()
            return Param(t.value)
        if t.kind == "KEYWORD" and t.value in ("TRUE", "FALSE"):
            self.next()
            return Literal(t.value == "TRUE")
        if t.kind == "KEYWORD" and t.value == "NULL":
            self.next()
            return Literal(None)
        if t.kind == "KEYWORD" and t.value == "CASE":
            return self.parse_case()
        if t.kind == "KEYWORD" and t.value == "COUNT":
            # COUNT is also a keyword-ish function in some corpora; treat
            # uniformly via NAME path below
            pass
        if t.value == "(":
            self.next()
            e = self.parse_expr()
            self.expect_op(")")
            return e
        if t.value == "[":
            self.next()
            items = []
            while self.peek().value != "]":
                items.append(self.parse_expr())
                if not self.accept_op(","):
                    break
            self.expect_op("]")
            return ListLiteral(items)
        if t.value == "{":
            self.next()
            entries: list = []
            while self.peek().value != "}":
                key_tok = self.next()
                if key_tok.kind not in ("NAME", "STRING", "KEYWORD"):
                    raise CypherSyntaxError(
                        f"Expected map key at {key_tok.pos}, got {key_tok.value!r}"
                    )
                key = key_tok.value if key_tok.kind != "KEYWORD" else key_tok.value.lower()
                self.expect_op(":")
                entries.append((key, self.parse_expr()))
                if not self.accept_op(","):
                    break
            self.expect_op("}")
            return MapLiteral(entries)
        if t.kind == "NAME":
            self.next()
            if self.peek().value == "(":
                self.next()
                distinct = False
                args: list = []
                if self.at_keyword("DISTINCT"):
                    self.next()
                    distinct = True
                if self.peek().value == "*":
                    self.next()
                    args.append(VarRef("*"))
                elif self.peek().value != ")":
                    args.append(self.parse_expr())
                    while self.accept_op(","):
                        args.append(self.parse_expr())
                self.expect_op(")")
                return FuncCall(t.value.lower(), args, distinct)
            return VarRef(t.value)
        raise CypherSyntaxError(f"Unexpected token {t.value!r} at {t.pos}")

    def parse_case(self):
        self.expect_keyword("CASE")
        whens = []
        default = None
        while self.at_keyword("WHEN"):
            self.next()
            cond = self.parse_expr()
            self.expect_keyword("THEN")
            whens.append((cond, self.parse_expr()))
        if self.at_keyword("ELSE"):
            self.next()
            default = self.parse_expr()
        self.expect_keyword("END")
        return CaseExpr(whens, default)


def parse_cypher(query: str) -> UnionQuery:
    return Parser(tokenize(query)).parse()
