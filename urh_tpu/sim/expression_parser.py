"""Restricted expression language for simulator formulas and rules.

Counterpart of urh/simulator/SimulatorExpressionParser.py: a safe
subset of the Python AST — arithmetic/bitwise operators for formulas,
boolean/comparison operators for rule conditions — evaluated over
``item<N>.<label>`` identifiers resolving to live message field values,
counter values and trigger-command return codes.
"""

from __future__ import annotations

import ast
import html
import operator as op

from urh_tpu.sim.items import (SimulatorCounterAction, SimulatorProtocolLabel,
                               SimulatorTriggerCommandAction)
from urh_tpu.util.logging import logger


class SimulatorExpressionParser:
    formula_help = ("Operators: + - * / | ^ & << >> ~ ; literals: dec/hex/bin/oct; "
                    "example: item1.sequence_number + 1")
    rule_condition_help = ("Boolean: and/or/not; comparisons: == != < <= > >=; "
                           "example: item1.data == \"abc\"")

    op_formula = {
        ast.Add: op.add, ast.Sub: op.sub, ast.Mult: op.mul, ast.Div: op.truediv,
        ast.BitOr: op.or_, ast.BitXor: op.xor, ast.BitAnd: op.and_,
        ast.LShift: op.lshift, ast.RShift: op.rshift, ast.Invert: op.invert,
    }
    op_cond = {
        ast.And: None, ast.Or: None, ast.Not: op.not_,
        ast.Eq: op.eq, ast.NotEq: op.ne, ast.Lt: op.lt, ast.LtE: op.le,
        ast.Gt: op.gt, ast.GtE: op.ge,
    }
    operators = {**op_formula, **op_cond}

    def __init__(self, config):
        self.simulator_config = config

    def validate_expression(self, expr, is_formula=True):
        valid = True
        node = None
        try:
            node = ast.parse(expr, mode="eval").body
            if is_formula:
                self.validate_formula_node(node)
            else:
                self.validate_condition_node(node)
        except SyntaxError as err:
            valid = False
            message = ("<pre>" + html.escape(expr) + "<br/>" + " " * (err.offset or 0)
                       + "^</pre>" + str(err))
        else:
            message = self.formula_help if is_formula else self.rule_condition_help
        return valid, message, node

    def evaluate_node(self, node):
        if isinstance(node, ast.BinOp):
            return self.operators[type(node.op)](self.evaluate_node(node.left),
                                                 self.evaluate_node(node.right))
        if isinstance(node, ast.UnaryOp):
            return self.operators[type(node.op)](self.evaluate_node(node.operand))
        if isinstance(node, ast.Compare):
            to_string = (isinstance(node.comparators[0], ast.Constant)
                         and isinstance(node.comparators[0].value, str))
            return self.operators[type(node.ops[0])](
                self.evaluate_attribute_node(node.left, to_string),
                self.evaluate_node(node.comparators[0]))
        if isinstance(node, ast.BoolOp):
            func = all if isinstance(node.op, ast.And) else any
            return func(self.evaluate_node(value) for value in node.values)
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            return node.value
        if isinstance(node, ast.Attribute):
            return self.evaluate_attribute_node(node)
        if isinstance(node, ast.Constant) and isinstance(node.value, (int, float)):
            return node.value
        logger.error("error during expression parsing")
        return None

    def evaluate_attribute_node(self, node, to_string=False):
        identifier = node.value.id + "." + node.attr
        item = self.simulator_config.item_dict[identifier]
        if isinstance(item, SimulatorProtocolLabel):
            label = item
            message = label.parent()
            start, end = message.get_label_range(label, 2 if to_string else 0, False)
            if to_string:
                return message.plain_ascii_str[start:end]
            # plain_bits_str reflects the last exchanged (sent/received) message
            return int(message.plain_bits_str[start:end], 2)
        if isinstance(item, SimulatorCounterAction):
            return item.value
        if isinstance(item, SimulatorTriggerCommandAction):
            return item.return_code

    def validate_formula_node(self, node):
        if isinstance(node, ast.Constant) and isinstance(node.value, (int, float)):
            return
        if isinstance(node, ast.BinOp):
            if type(node.op) not in self.op_formula:
                self.raise_syntax_error("unknown operator", node.lineno, node.col_offset)
            self.validate_formula_node(node.left)
            self.validate_formula_node(node.right)
        elif isinstance(node, ast.UnaryOp):
            if type(node.op) not in self.op_formula:
                self.raise_syntax_error("unknown operator", node.lineno, node.col_offset)
            self.validate_formula_node(node.operand)
        elif isinstance(node, ast.Attribute):
            self.validate_attribute_node(node)
        else:
            self.raise_syntax_error("", getattr(node, "lineno", 1), getattr(node, "col_offset", 0))

    def validate_condition_node(self, node):
        if isinstance(node, ast.UnaryOp):
            if type(node.op) not in self.op_cond:
                self.raise_syntax_error("unknown operator", node.lineno, node.col_offset)
            self.validate_condition_node(node.operand)
        elif isinstance(node, ast.Compare):
            if not (len(node.ops) == 1 and len(node.comparators) == 1):
                self.raise_syntax_error("", node.lineno, node.col_offset)
            if type(node.ops[0]) not in self.op_cond:
                self.raise_syntax_error("unknown operator", node.lineno, node.col_offset)
            self.validate_compare_nodes(node.left, node.comparators[0])
        elif isinstance(node, ast.BoolOp):
            for sub in node.values:
                self.validate_condition_node(sub)
        else:
            self.raise_syntax_error("", getattr(node, "lineno", 1), getattr(node, "col_offset", 0))

    def validate_compare_nodes(self, left, right):
        if not isinstance(left, ast.Attribute):
            self.raise_syntax_error("the left-hand side of a comparison must be a label identifier",
                                    left.lineno, left.col_offset)
        self.validate_attribute_node(left)

        is_const = isinstance(right, ast.Constant) and isinstance(right.value, (int, float, str))
        if not (is_const or isinstance(right, ast.Attribute)):
            self.raise_syntax_error("the right-hand side of a comparison must be a number, "
                                    "a string or a label identifier",
                                    right.lineno, right.col_offset)
        if isinstance(right, ast.Attribute):
            self.validate_attribute_node(right)

    def validate_attribute_node(self, node):
        if not isinstance(node.value, ast.Name):
            self.raise_syntax_error("", node.lineno, node.col_offset)
        identifier = node.value.id + "." + node.attr
        if not self.is_valid_identifier(identifier):
            self.raise_syntax_error("'" + identifier + "' is not a valid label identifier",
                                    node.lineno, node.col_offset)

    def is_valid_identifier(self, identifier):
        try:
            item = self.simulator_config.item_dict[identifier]
            return (isinstance(item, SimulatorProtocolLabel)
                    or isinstance(item, SimulatorCounterAction)
                    or (isinstance(item, SimulatorTriggerCommandAction)
                        and identifier.endswith("rc")))
        except KeyError:
            return False

    def get_identifiers(self):
        return [identifier for identifier in self.simulator_config.item_dict
                if self.is_valid_identifier(identifier)]

    def raise_syntax_error(self, message, lineno, col_offset):
        if message == "":
            message = "_invalid syntax"
        raise SyntaxError(message, ("", lineno, col_offset, ""))
