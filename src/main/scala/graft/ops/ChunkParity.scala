package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q201: chunk-boundary parity corpus for the P3 splitter (reference
  * chunker.rs:89-116, which delegates to the public code-splitter
  * crate: tree-sitter parse, recursive descent into nodes larger than
  * max_size = 1000 chars, greedy merge of adjacent siblings that fit).
  *
  * One pinned fixture file per supported language (language.rs:4-17's
  * twelve: Rust, JavaScript, TypeScript, Java, C++, C, Ruby, C#,
  * Swift, Go, Python, Markdown), each sized to force packing decisions
  * (multiple chunks) and to exercise the language's structural trivia:
  * attribute/decorator binding, doc comments, class wrappers larger
  * than the budget (the recursive-descent case), def/end blocks,
  * heading sections with opaque fences.
  *
  * The Spark side runs each fixture through the PRODUCTION indexing
  * seam (Chunker.fileChunkRows: extension detect -> language detect ->
  * splitStructured), so q201 pins the full P1+P3 path, not a test
  * double. The DuckDB side is the expected chunk table as a literal
  * VALUES relation — after any DELIBERATE splitter change, run
  * ChunkParitySpec: on mismatch it prints the regenerated `expected`
  * block to paste here.
  *
  * What the pin certifies (SURVEY §8 has the per-language table):
  * chunk boundaries land between top-level declarations exactly as
  * the reference's AST-node packing does on these fixtures (verified
  * per-fixture by ChunkParitySpec's boundary invariants: every chunk
  * starts at a declaration/comment/heading line, no fitting
  * declaration is ever split, budget respected, byte-exact
  * round-trip). DEFAULT chunk content deliberately differs from the
  * reference in whitespace ownership: this splitter's chunks are
  * contiguous line spans (concatenation round-trips, blank lines
  * belong to the preceding chunk), while code-splitter emits
  * node-aligned byte ranges that drop whitespace BETWEEN chunks and
  * never carry a trailing newline. Round 14 closed that last delta:
  * the ref_len/ref_md5 columns pin the
  * [[graft.chat.Chunker.refWhitespace]] projection, whose chunk text
  * is byte-identical to the reference's node-aligned ranges on these
  * fixtures (given boundary parity, each chunk's node-aligned bytes
  * are its line span stripped of edge whitespace — interior
  * whitespace between merged siblings lies inside the byte range both
  * ways). The default mode is unchanged.
  */
object ChunkParity {

  /** (file name, fixture content) per supported language. */
  val fixtures: Seq[(String, String)] = Seq(
    "fixture.rs" ->
      """//! Geometry primitives for the parity corpus.
        ~
        ~use std::fmt;
        ~
        ~const SCALE: f64 = 2.0;
        ~
        ~#[derive(Debug, Clone, Copy)]
        ~pub struct Point {
        ~    pub x: f64,
        ~    pub y: f64,
        ~}
        ~
        ~impl Point {
        ~    pub fn new(x: f64, y: f64) -> Point {
        ~        Point { x, y }
        ~    }
        ~
        ~    pub fn norm(&self) -> f64 {
        ~        (self.x * self.x + self.y * self.y).sqrt()
        ~    }
        ~
        ~    pub fn scaled(&self) -> Point {
        ~        Point::new(self.x * SCALE, self.y * SCALE)
        ~    }
        ~}
        ~
        ~impl fmt::Display for Point {
        ~    fn fmt(&self, f: &mut fmt::Formatter) -> fmt::Result {
        ~        write!(f, "({}, {})", self.x, self.y)
        ~    }
        ~}
        ~
        ~/// Midpoint of two points.
        ~pub fn midpoint(a: Point, b: Point) -> Point {
        ~    Point::new((a.x + b.x) / 2.0, (a.y + b.y) / 2.0)
        ~}
        ~
        ~/// Euclidean distance between two points.
        ~pub fn distance(a: Point, b: Point) -> f64 {
        ~    let dx = a.x - b.x;
        ~    let dy = a.y - b.y;
        ~    (dx * dx + dy * dy).sqrt()
        ~}
        ~
        ~#[derive(Debug, Clone, Copy)]
        ~pub struct Rect {
        ~    pub lo: Point,
        ~    pub hi: Point,
        ~}
        ~
        ~impl Rect {
        ~    pub fn area(&self) -> f64 {
        ~        (self.hi.x - self.lo.x) * (self.hi.y - self.lo.y)
        ~    }
        ~
        ~    pub fn contains(&self, p: Point) -> bool {
        ~        p.x >= self.lo.x && p.x <= self.hi.x
        ~            && p.y >= self.lo.y && p.y <= self.hi.y
        ~    }
        ~
        ~    pub fn expanded(&self, by: f64) -> Rect {
        ~        Rect {
        ~            lo: Point::new(self.lo.x - by, self.lo.y - by),
        ~            hi: Point::new(self.hi.x + by, self.hi.y + by),
        ~        }
        ~    }
        ~}
        ~
        ~/// Bounding box of a point slice.
        ~pub fn bounds(points: &[Point]) -> Rect {
        ~    let mut lo = Point::new(f64::MAX, f64::MAX);
        ~    let mut hi = Point::new(f64::MIN, f64::MIN);
        ~    for p in points {
        ~        lo = Point::new(lo.x.min(p.x), lo.y.min(p.y));
        ~        hi = Point::new(hi.x.max(p.x), hi.y.max(p.y));
        ~    }
        ~    Rect { lo, hi }
        ~}
        ~""".stripMargin('~'),

    "fixture.js" ->
      """// Event bus for the parity corpus.
        ~
        ~const listeners = new Map();
        ~
        ~function on(name, fn) {
        ~    if (!listeners.has(name)) {
        ~        listeners.set(name, []);
        ~    }
        ~    listeners.get(name).push(fn);
        ~}
        ~
        ~function off(name, fn) {
        ~    const fns = listeners.get(name) || [];
        ~    const idx = fns.indexOf(fn);
        ~    if (idx >= 0) {
        ~        fns.splice(idx, 1);
        ~    }
        ~}
        ~
        ~function emit(name, payload) {
        ~    const fns = listeners.get(name) || [];
        ~    for (const fn of fns) {
        ~        fn(payload);
        ~    }
        ~    return fns.length;
        ~}
        ~
        ~function once(name, fn) {
        ~    const wrapper = (payload) => {
        ~        off(name, wrapper);
        ~        fn(payload);
        ~    };
        ~    on(name, wrapper);
        ~}
        ~
        ~function listenerCount(name) {
        ~    const fns = listeners.get(name) || [];
        ~    return fns.length;
        ~}
        ~
        ~function clear(name) {
        ~    if (name === undefined) {
        ~        listeners.clear();
        ~        return;
        ~    }
        ~    listeners.delete(name);
        ~}
        ~
        ~function names() {
        ~    const out = [];
        ~    for (const key of listeners.keys()) {
        ~        out.push(key);
        ~    }
        ~    out.sort();
        ~    return out;
        ~}
        ~
        ~function emitAll(payload) {
        ~    let total = 0;
        ~    for (const key of names()) {
        ~        total += emit(key, payload);
        ~    }
        ~    return total;
        ~}
        ~
        ~module.exports = { on, off, emit, once, listenerCount, clear, names, emitAll };
        ~""".stripMargin('~'),

    "fixture.ts" ->
      """// Typed cache for the parity corpus.
        ~
        ~export interface Entry<V> {
        ~    value: V;
        ~    expiresAt: number;
        ~}
        ~
        ~export class TtlCache<V> {
        ~    private store = new Map<string, Entry<V>>();
        ~
        ~    constructor(private ttlMs: number) {}
        ~
        ~    get(key: string, now: number): V | undefined {
        ~        const e = this.store.get(key);
        ~        if (e === undefined) {
        ~            return undefined;
        ~        }
        ~        if (e.expiresAt <= now) {
        ~            this.store.delete(key);
        ~            return undefined;
        ~        }
        ~        return e.value;
        ~    }
        ~
        ~    put(key: string, value: V, now: number): void {
        ~        this.store.set(key, { value, expiresAt: now + this.ttlMs });
        ~    }
        ~
        ~    size(): number {
        ~        return this.store.size;
        ~    }
        ~}
        ~
        ~export function memoize<V>(cache: TtlCache<V>, key: string,
        ~                           now: number, make: () => V): V {
        ~    const hit = cache.get(key, now);
        ~    if (hit !== undefined) {
        ~        return hit;
        ~    }
        ~    const value = make();
        ~    cache.put(key, value, now);
        ~    return value;
        ~}
        ~
        ~export function sweep<V>(cache: TtlCache<V>, keys: string[],
        ~                         now: number): number {
        ~    let evicted = 0;
        ~    for (const key of keys) {
        ~        if (cache.get(key, now) === undefined) {
        ~            evicted += 1;
        ~        }
        ~    }
        ~    return evicted;
        ~}
        ~
        ~export const DEFAULT_TTL_MS = 60000;
        ~
        ~export function withDefault<V>(make: () => V): TtlCache<V> {
        ~    return new TtlCache<V>(DEFAULT_TTL_MS);
        ~}
        ~""".stripMargin('~'),

    "fixture.java" ->
      """package graft.parity;
        ~
        ~import java.util.ArrayList;
        ~import java.util.List;
        ~
        ~/** Running statistics accumulator for the parity corpus. */
        ~public final class RunningStats {
        ~    private long count = 0;
        ~    private double mean = 0.0;
        ~    private double m2 = 0.0;
        ~    private final List<Double> window = new ArrayList<>();
        ~
        ~    public void add(double x) {
        ~        count += 1;
        ~        double delta = x - mean;
        ~        mean += delta / count;
        ~        m2 += delta * (x - mean);
        ~        window.add(x);
        ~    }
        ~
        ~    public long getCount() {
        ~        return count;
        ~    }
        ~
        ~    public double getMean() {
        ~        return mean;
        ~    }
        ~
        ~    public double getVariance() {
        ~        if (count < 2) {
        ~            return 0.0;
        ~        }
        ~        return m2 / (count - 1);
        ~    }
        ~
        ~    public double getMax() {
        ~        double best = Double.NEGATIVE_INFINITY;
        ~        for (double x : window) {
        ~            if (x > best) {
        ~                best = x;
        ~            }
        ~        }
        ~        return best;
        ~    }
        ~
        ~    public double getMin() {
        ~        double best = Double.POSITIVE_INFINITY;
        ~        for (double x : window) {
        ~            if (x < best) {
        ~                best = x;
        ~            }
        ~        }
        ~        return best;
        ~    }
        ~
        ~    public void reset() {
        ~        count = 0;
        ~        mean = 0.0;
        ~        m2 = 0.0;
        ~        window.clear();
        ~    }
        ~}
        ~""".stripMargin('~'),

    "fixture.cpp" ->
      """// Ring buffer for the parity corpus.
        ~#include <cstddef>
        ~#include <vector>
        ~
        ~namespace parity {
        ~
        ~class RingBuffer {
        ~public:
        ~    explicit RingBuffer(std::size_t cap)
        ~        : data_(cap), head_(0), size_(0) {}
        ~
        ~    void push(int v) {
        ~        data_[(head_ + size_) % data_.size()] = v;
        ~        if (size_ < data_.size()) {
        ~            size_ += 1;
        ~        } else {
        ~            head_ = (head_ + 1) % data_.size();
        ~        }
        ~    }
        ~
        ~    int at(std::size_t i) const {
        ~        return data_[(head_ + i) % data_.size()];
        ~    }
        ~
        ~    std::size_t size() const {
        ~        return size_;
        ~    }
        ~
        ~private:
        ~    std::vector<int> data_;
        ~    std::size_t head_;
        ~    std::size_t size_;
        ~};
        ~
        ~int sum(const RingBuffer& rb) {
        ~    int total = 0;
        ~    for (std::size_t i = 0; i < rb.size(); ++i) {
        ~        total += rb.at(i);
        ~    }
        ~    return total;
        ~}
        ~
        ~int maxval(const RingBuffer& rb) {
        ~    int best = 0;
        ~    for (std::size_t i = 0; i < rb.size(); ++i) {
        ~        if (rb.at(i) > best) {
        ~            best = rb.at(i);
        ~        }
        ~    }
        ~    return best;
        ~}
        ~
        ~double mean(const RingBuffer& rb) {
        ~    if (rb.size() == 0) {
        ~        return 0.0;
        ~    }
        ~    return static_cast<double>(sum(rb)) / rb.size();
        ~}
        ~
        ~bool any_negative(const RingBuffer& rb) {
        ~    for (std::size_t i = 0; i < rb.size(); ++i) {
        ~        if (rb.at(i) < 0) {
        ~            return true;
        ~        }
        ~    }
        ~    return false;
        ~}
        ~
        ~}  // namespace parity
        ~""".stripMargin('~'),

    "fixture.c" ->
      """/* Checksum helpers for the parity corpus. */
        ~#include <stddef.h>
        ~#include <stdint.h>
        ~
        ~#define SEED 2166136261u
        ~
        ~uint32_t fnv1a(const uint8_t *buf, size_t len) {
        ~    uint32_t h = SEED;
        ~    for (size_t i = 0; i < len; i++) {
        ~        h ^= buf[i];
        ~        h *= 16777619u;
        ~    }
        ~    return h;
        ~}
        ~
        ~uint32_t adler32(const uint8_t *buf, size_t len) {
        ~    uint32_t a = 1, b = 0;
        ~    for (size_t i = 0; i < len; i++) {
        ~        a = (a + buf[i]) % 65521u;
        ~        b = (b + a) % 65521u;
        ~    }
        ~    return (b << 16) | a;
        ~}
        ~
        ~int checksums_match(const uint8_t *buf, size_t len, uint32_t want) {
        ~    uint32_t got = fnv1a(buf, len);
        ~    if (got == want) {
        ~        return 1;
        ~    }
        ~    return 0;
        ~}
        ~
        ~uint32_t crc_combine(uint32_t a, uint32_t b) {
        ~    uint32_t mixed = a ^ (b + 0x9e3779b9u + (a << 6) + (a >> 2));
        ~    return mixed;
        ~}
        ~
        ~size_t chunk_count(size_t len, size_t chunk) {
        ~    if (chunk == 0) {
        ~        return 0;
        ~    }
        ~    return (len + chunk - 1) / chunk;
        ~}
        ~
        ~uint32_t digest_chunks(const uint8_t *buf, size_t len, size_t chunk) {
        ~    uint32_t acc = 0;
        ~    size_t n = chunk_count(len, chunk);
        ~    for (size_t i = 0; i < n; i++) {
        ~        size_t off = i * chunk;
        ~        size_t take = len - off < chunk ? len - off : chunk;
        ~        acc = crc_combine(acc, fnv1a(buf + off, take));
        ~    }
        ~    return acc;
        ~}
        ~""".stripMargin('~'),

    "fixture.rb" ->
      """# Inventory tracker for the parity corpus.
        ~require 'json'
        ~
        ~class Inventory
        ~  def initialize
        ~    @items = Hash.new(0)
        ~  end
        ~
        ~  def add(name, qty)
        ~    @items[name] += qty
        ~  end
        ~
        ~  def remove(name, qty)
        ~    have = @items[name]
        ~    take = [have, qty].min
        ~    @items[name] = have - take
        ~    take
        ~  end
        ~
        ~  def total
        ~    @items.values.sum
        ~  end
        ~
        ~  def to_json
        ~    JSON.generate(@items)
        ~  end
        ~end
        ~
        ~# Merge two inventories into a new one.
        ~def merge(a, b)
        ~  out = Inventory.new
        ~  [a, b].each do |inv|
        ~    JSON.parse(inv.to_json).each do |name, qty|
        ~      out.add(name, qty)
        ~    end
        ~  end
        ~  out
        ~end
        ~
        ~def empty?(inv)
        ~  inv.total.zero?
        ~end
        ~
        ~# Report lines for an inventory, sorted by name.
        ~class Reporter
        ~  def initialize(inv)
        ~    @inv = inv
        ~  end
        ~
        ~  def lines
        ~    parsed = JSON.parse(@inv.to_json)
        ~    parsed.keys.sort.map do |name|
        ~      format('%s: %d', name, parsed[name])
        ~    end
        ~  end
        ~
        ~  def summary
        ~    "#{lines.size} kinds, #{@inv.total} items"
        ~  end
        ~end
        ~
        ~module Audit
        ~  def self.diff(before, after)
        ~    a = JSON.parse(before.to_json)
        ~    b = JSON.parse(after.to_json)
        ~    (a.keys + b.keys).uniq.sort.map do |name|
        ~      [name, b.fetch(name, 0) - a.fetch(name, 0)]
        ~    end
        ~  end
        ~end
        ~
        ~# A big class (over the budget) exercising def/end descent.
        ~class Warehouse
        ~  def initialize(name)
        ~    @name = name
        ~    @bays = {}
        ~    @sealed = false
        ~  end
        ~
        ~  def store(bay, item, qty)
        ~    raise 'sealed' if @sealed
        ~    @bays[bay] ||= Hash.new(0)
        ~    @bays[bay][item] += qty
        ~  end
        ~
        ~  def retrieve(bay, item, qty)
        ~    raise 'sealed' if @sealed
        ~    have = @bays.fetch(bay, {}).fetch(item, 0)
        ~    take = [have, qty].min
        ~    @bays[bay][item] = have - take if take > 0
        ~    take
        ~  end
        ~
        ~  def occupancy
        ~    @bays.transform_values do |items|
        ~      items.values.sum
        ~    end
        ~  end
        ~
        ~  def heaviest_bay
        ~    occupancy.max_by do |bay, total|
        ~      [total, bay]
        ~    end
        ~  end
        ~
        ~  def transfer(other, bay, item, qty)
        ~    moved = retrieve(bay, item, qty)
        ~    other.store(bay, item, moved) if moved > 0
        ~    moved
        ~  end
        ~
        ~  def manifest
        ~    occupancy.keys.sort.map do |bay|
        ~      format('%s: %d items', bay, occupancy[bay])
        ~    end
        ~  end
        ~
        ~  def empty_bays
        ~    occupancy.select do |bay, total|
        ~      total.zero?
        ~    end.keys.sort
        ~  end
        ~
        ~  def seal!
        ~    @sealed = true
        ~    @name
        ~  end
        ~
        ~  def sealed?
        ~    @sealed
        ~  end
        ~end
        ~""".stripMargin('~'),

    "fixture.cs" ->
      """using System;
        ~using System.Collections.Generic;
        ~
        ~namespace Graft.Parity
        ~{
        ~    /// <summary>Priority task queue for the parity corpus.</summary>
        ~    public sealed class TaskQueue
        ~    {
        ~        private readonly SortedDictionary<int, Queue<string>> lanes =
        ~            new SortedDictionary<int, Queue<string>>();
        ~
        ~        public int Count { get; private set; }
        ~
        ~        public void Enqueue(string task, int priority)
        ~        {
        ~            if (!lanes.TryGetValue(priority, out var lane))
        ~            {
        ~                lane = new Queue<string>();
        ~                lanes[priority] = lane;
        ~            }
        ~            lane.Enqueue(task);
        ~            Count += 1;
        ~        }
        ~
        ~        public string Dequeue()
        ~        {
        ~            foreach (var kv in lanes)
        ~            {
        ~                if (kv.Value.Count > 0)
        ~                {
        ~                    Count -= 1;
        ~                    return kv.Value.Dequeue();
        ~                }
        ~            }
        ~            throw new InvalidOperationException("empty queue");
        ~        }
        ~
        ~        public bool IsEmpty()
        ~        {
        ~            return Count == 0;
        ~        }
        ~
        ~        public void Clear()
        ~        {
        ~            lanes.Clear();
        ~            Count = 0;
        ~        }
        ~    }
        ~}
        ~""".stripMargin('~'),

    "fixture.swift" ->
      """// Temperature series for the parity corpus.
        ~import Foundation
        ~
        ~struct Reading {
        ~    let celsius: Double
        ~    let at: Int
        ~}
        ~
        ~enum Trend {
        ~    case rising
        ~    case falling
        ~    case flat
        ~}
        ~
        ~func trend(of readings: [Reading]) -> Trend {
        ~    guard let first = readings.first, let last = readings.last else {
        ~        return .flat
        ~    }
        ~    if last.celsius > first.celsius + 0.5 {
        ~        return .rising
        ~    }
        ~    if last.celsius < first.celsius - 0.5 {
        ~        return .falling
        ~    }
        ~    return .flat
        ~}
        ~
        ~func average(_ readings: [Reading]) -> Double {
        ~    if readings.isEmpty {
        ~        return 0.0
        ~    }
        ~    let total = readings.reduce(0.0) { acc, r in acc + r.celsius }
        ~    return total / Double(readings.count)
        ~}
        ~
        ~func toFahrenheit(_ c: Double) -> Double {
        ~    return c * 9.0 / 5.0 + 32.0
        ~}
        ~
        ~struct Summary {
        ~    let min: Double
        ~    let max: Double
        ~    let mean: Double
        ~}
        ~
        ~func summarize(_ readings: [Reading]) -> Summary {
        ~    var lo = Double.infinity
        ~    var hi = -Double.infinity
        ~    for r in readings {
        ~        if r.celsius < lo {
        ~            lo = r.celsius
        ~        }
        ~        if r.celsius > hi {
        ~            hi = r.celsius
        ~        }
        ~    }
        ~    return Summary(min: lo, max: hi, mean: average(readings))
        ~}
        ~
        ~func anomalies(_ readings: [Reading], tolerance: Double) -> [Reading] {
        ~    let avg = average(readings)
        ~    return readings.filter { r in
        ~        abs(r.celsius - avg) > tolerance
        ~    }
        ~}
        ~""".stripMargin('~'),

    "fixture.go" ->
      """// Package parity holds the Go parity fixture.
        ~package parity
        ~
        ~import (
        ~	"sort"
        ~	"strings"
        ~)
        ~
        ~// WordCount tallies whitespace-separated words.
        ~func WordCount(text string) map[string]int {
        ~	counts := make(map[string]int)
        ~	for _, w := range strings.Fields(text) {
        ~		counts[w]++
        ~	}
        ~	return counts
        ~}
        ~
        ~// TopWords returns the k most frequent words, ties by word.
        ~func TopWords(text string, k int) []string {
        ~	counts := WordCount(text)
        ~	words := make([]string, 0, len(counts))
        ~	for w := range counts {
        ~		words = append(words, w)
        ~	}
        ~	sort.Slice(words, func(i, j int) bool {
        ~		if counts[words[i]] != counts[words[j]] {
        ~			return counts[words[i]] > counts[words[j]]
        ~		}
        ~		return words[i] < words[j]
        ~	})
        ~	if k > len(words) {
        ~		k = len(words)
        ~	}
        ~	return words[:k]
        ~}
        ~
        ~// Join concatenates words with a separator.
        ~func Join(words []string, sep string) string {
        ~	return strings.Join(words, sep)
        ~}
        ~
        ~// Histogram buckets counts by frequency.
        ~func Histogram(text string) map[int]int {
        ~	hist := make(map[int]int)
        ~	for _, n := range WordCount(text) {
        ~		hist[n]++
        ~	}
        ~	return hist
        ~}
        ~
        ~// Vocabulary returns the sorted distinct words.
        ~func Vocabulary(text string) []string {
        ~	counts := WordCount(text)
        ~	words := make([]string, 0, len(counts))
        ~	for w := range counts {
        ~		words = append(words, w)
        ~	}
        ~	sort.Strings(words)
        ~	return words
        ~}
        ~
        ~// TypeToken reports whether the vocabulary is rich.
        ~func TypeToken(text string, threshold float64) bool {
        ~	counts := WordCount(text)
        ~	total := 0
        ~	for _, n := range counts {
        ~		total += n
        ~	}
        ~	if total == 0 {
        ~		return false
        ~	}
        ~	return float64(len(counts))/float64(total) >= threshold
        ~}
        ~""".stripMargin('~'),

    "fixture.py" ->
      """%Q%Retry helpers for the parity corpus.%Q%
        ~
        ~import time
        ~
        ~MAX_ATTEMPTS = 3
        ~
        ~
        ~def backoff(attempt):
        ~    %Q%Exponential backoff in milliseconds.%Q%
        ~    return 100 * (2 ** attempt)
        ~
        ~
        ~@staticmethod
        ~def jitter(ms, seed):
        ~    %Q%Deterministic pseudo-jitter from a seed.%Q%
        ~    return ms + (seed * 37) % 50
        ~
        ~
        ~class Retrier:
        ~    %Q%Calls a function until it succeeds or attempts run out.%Q%
        ~
        ~    def __init__(self, attempts=MAX_ATTEMPTS):
        ~        self.attempts = attempts
        ~        self.calls = 0
        ~
        ~    def run(self, fn):
        ~        last = None
        ~        for attempt in range(self.attempts):
        ~            self.calls += 1
        ~            try:
        ~                return fn()
        ~            except ValueError as exc:
        ~                last = exc
        ~                time.sleep(backoff(attempt) / 1000.0)
        ~        raise last
        ~
        ~
        ~def always_fails():
        ~    raise ValueError("nope")
        ~
        ~
        ~class CountingRetrier(Retrier):
        ~    %Q%Retrier that also tracks successes and failures.%Q%
        ~
        ~    def __init__(self, attempts=MAX_ATTEMPTS):
        ~        super().__init__(attempts)
        ~        self.successes = 0
        ~        self.failures = 0
        ~
        ~    def run(self, fn):
        ~        try:
        ~            result = super().run(fn)
        ~            self.successes += 1
        ~            return result
        ~        except ValueError:
        ~            self.failures += 1
        ~            raise
        ~
        ~    @property
        ~    def ratio(self):
        ~        total = self.successes + self.failures
        ~        if total == 0:
        ~            return 0.0
        ~        return self.successes / total
        ~
        ~
        ~def run_all(fns, attempts=MAX_ATTEMPTS):
        ~    %Q%Run every function under one retrier, collecting results.%Q%
        ~    r = CountingRetrier(attempts)
        ~    out = []
        ~    for fn in fns:
        ~        out.append(r.run(fn))
        ~    return out
        ~
        ~
        ~class RetryPolicyTable:
        ~    %Q%A big class (over the budget) exercising indent descent.%Q%
        ~
        ~    def __init__(self):
        ~        self.policies = {}
        ~        self.default_attempts = MAX_ATTEMPTS
        ~        self.default_backoff_ms = 100
        ~
        ~    def register(self, name, attempts, backoff_ms):
        ~        if attempts < 1:
        ~            raise ValueError("attempts must be positive")
        ~        self.policies[name] = (attempts, backoff_ms)
        ~
        ~    def lookup(self, name):
        ~        if name in self.policies:
        ~            return self.policies[name]
        ~        return (self.default_attempts, self.default_backoff_ms)
        ~
        ~    def budget_ms(self, name):
        ~        attempts, base = self.lookup(name)
        ~        total = 0
        ~        for attempt in range(attempts):
        ~            total += base * (2 ** attempt)
        ~        return total
        ~
        ~    def names(self):
        ~        return sorted(self.policies.keys())
        ~
        ~    def merge(self, other):
        ~        merged = RetryPolicyTable()
        ~        for name in self.names():
        ~            merged.policies[name] = self.policies[name]
        ~        for name in other.names():
        ~            merged.policies[name] = other.policies[name]
        ~        return merged
        ~""".stripMargin('~')
        // triple-quoted Scala literals cannot hold a `"""` docstring
        // marker, so the fixture carries %Q% and swaps it here
        .replace("%Q%", "\"\"\""),

    "fixture.md" ->
      """# Parity Corpus Guide
        ~
        ~This fixture exercises heading sections and opaque fences.
        ~
        ~## Install
        ~
        ~Run the installer:
        ~
        ~```sh
        ~# this hash line is a comment, not a heading
        ~make install
        ~```
        ~
        ~Then check the version.
        ~
        ~## Usage
        ~
        ~Call the entry point with a path and a budget. The splitter
        ~packs declaration units greedily and never breaks a fitting
        ~unit across chunks.
        ~
        ~### Flags
        ~
        ~Two flags matter: `--max-size` and `--language`.
        ~
        ~## Architecture
        ~
        ~The engine reads a repository, detects languages by extension,
        ~splits files into declaration-aligned chunks, embeds each chunk,
        ~and builds a random-projection forest over the vectors.
        ~
        ~Retrieval over-fetches twice the requested k, applies folder,
        ~extension, and exclude filters, splits code from docs, then
        ~packs the answer window.
        ~
        ~```python
        ~# a fence in the middle keeps this section opaque
        ~def not_a_heading():
        ~    return "# still not a heading"
        ~```
        ~
        ~## Troubleshooting
        ~
        ~If the index is stale, re-run the indexer with the same root.
        ~If a query returns nothing, loosen the filters: the folder
        ~filter matches path substrings, and excludes win over includes.
        ~
        ~## License
        ~
        ~MIT. See the LICENSE file for details.
        ~
        ~## Appendix: a long section exercising paragraph descent
        ~
        ~This section is deliberately larger than the chunk budget and has
        ~no sub-headings, so the splitter must descend to paragraphs, the
        ~way the reference descends into a section node's block children.
        ~
        ~The first consideration is corpus layout. A repository of mixed
        ~prose and code produces chunk tables whose size distribution is
        ~bimodal: prose sections pack near the budget, while code files
        ~break at declaration boundaries well short of it.
        ~
        ~The second consideration is determinism. Every boundary decision
        ~in the splitter is a pure function of the bytes, so two runs over
        ~the same corpus produce byte-identical chunk tables, which is the
        ~property the incremental indexer's change detection relies on.
        ~
        ~```text
        ~a fence inside the long section stays opaque
        ~
        ~even across a blank line inside the fence
        ~```
        ~
        ~The third consideration is the budget itself. One thousand
        ~characters approximates the embedding model's effective context;
        ~chunks much longer than that dilute the vector, and chunks much
        ~shorter than it waste index entries on fragments.
        ~
        ~A final paragraph closes out the appendix so the section ends on
        ~prose rather than on the fence.
        ~""".stripMargin('~'))

  /** Alias-extension fixtures: the reference maps several extensions
    * onto one grammar (language.rs:57-72 — jsx/mjs, tsx, cxx/cc/hpp,
    * `.h` to C (not C++), pyx/pyi, markdown) and lowercases before the
    * lookup (language.rs:77, tested with RS/JS/TS at :131-154). Each
    * alias file is small (one chunk); what q201 pins here is the
    * P1 extension→language dimension through the production path. */
  val aliasFixtures: Seq[(String, String)] = Seq(
    "alias.mjs" ->
      """export const VERSION = 3;
        ~
        ~export function bump(v) {
        ~    return v + 1;
        ~}
        ~""".stripMargin('~'),
    "alias.tsx" ->
      """export function label(name: string): string {
        ~    return name.toUpperCase();
        ~}
        ~""".stripMargin('~'),
    "alias.hpp" ->
      """#pragma once
        ~
        ~namespace parity {
        ~inline int twice(int x) {
        ~    return x * 2;
        ~}
        ~}  // namespace parity
        ~""".stripMargin('~'),
    "alias.h" ->
      """#ifndef PARITY_ALIAS_H
        ~#define PARITY_ALIAS_H
        ~
        ~int parity_add(int a, int b);
        ~int parity_sub(int a, int b);
        ~
        ~#endif
        ~""".stripMargin('~'),
    "alias.pyi" ->
      """from typing import List
        ~
        ~def tokenize(text: str) -> List[str]: ...
        ~
        ~def detokenize(tokens: List[str]) -> str: ...
        ~""".stripMargin('~'),
    "alias.markdown" ->
      """# Alias
        ~
        ~The `.markdown` extension resolves to the same grammar as `.md`.
        ~""".stripMargin('~'),
    "alias.GO" ->
      """package parity
        ~
        ~// Upper-case extensions resolve case-insensitively.
        ~func Alias() string {
        ~	return "GO"
        ~}
        ~""".stripMargin('~'))

  /** The q201 query: every fixture through the production indexing
    * seam, projected to the pinned parity schema. `file` keys the rows
    * (two fixtures may share a language). ref_len/ref_md5 pin the
    * [[graft.chat.Chunker.refWhitespace]] node-aligned content
    * projection (round 14 — the reference's chunks are byte ranges
    * that drop inter-chunk whitespace; with grouping parity certified
    * by the other columns, the ref columns certify BYTE-identical
    * chunk text on these fixtures). The two modes are zipped by
    * position: on these fixtures no chunk is all-whitespace, so the
    * ref run emits the same row count — the spec pins that too. */
  def chunkParity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rows = (fixtures ++ aliasFixtures).flatMap { case (file, text) =>
      val ref = graft.chat.Chunker.fileChunkRows(file, text, refContent = true)
        .map { case (_, idx, chunk, _, _) => idx -> chunk }.toMap
      val default = graft.chat.Chunker.fileChunkRows(file, text)
      // ADVICE r14: a count drift between the modes would silently
      // pair every post-drop chunk with the WRONG ref chunk and only
      // surface as a tail-index NoSuchElementException — assert the
      // pairing precondition with the file named instead
      require(ref.size == default.size,
        s"$file: refWhitespace emitted ${ref.size} chunks vs ${default.size} default — " +
          "positional mode pairing broken")
      default.map {
        case (_, idx, chunk, lang, _) =>
          val rc = ref(idx)
          (file, lang.getOrElse(""), idx.toLong, chunk.length.toLong,
            chunk.linesIterator.find(_.trim.nonEmpty).map(_.trim).getOrElse(""),
            md5Hex(chunk), rc.length.toLong, md5Hex(rc))
      }
    }
    rows.toDF("file", "language", "chunk_idx", "chunk_len", "first_line",
        "chunk_md5", "ref_len", "ref_md5")
      .orderBy("file", "chunk_idx")
  }

  private def md5Hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** The expected chunk table as DuckDB VALUES literals — the pinned
    * cross-engine oracle. Regenerated by printExpected() after any
    * deliberate splitter change; ChunkParitySpec fails (and prints the
    * fresh table) if the splitter drifts from this pin. */
  def chunkParitySql: String = {
    val rows = expected.map { case (file, lang, idx, len, first, h, rl, rh) =>
      s"('${file}', '${lang}', ${idx}, ${len}, '${first.replace("'", "''")}', '${h}', ${rl}, '${rh}')"
    }.mkString(",\n  ")
    s"""SELECT file, language, cast(chunk_idx as bigint) AS chunk_idx,
       |  cast(chunk_len as bigint) AS chunk_len, first_line, chunk_md5,
       |  cast(ref_len as bigint) AS ref_len, ref_md5
       |FROM (VALUES
       |  $rows)
       |  AS t(file, language, chunk_idx, chunk_len, first_line, chunk_md5, ref_len, ref_md5)
       |ORDER BY file, chunk_idx""".stripMargin
  }

  /** The pinned expectation (language, chunk_idx, chunk_len,
    * first_line, chunk_md5) — authored by running the splitter over
    * the fixtures and HAND-VERIFYING every boundary against the
    * reference's packing rule (greedy <= 1000 over declaration nodes,
    * descent into oversized ones — see ChunkParitySpec's invariants
    * and the SURVEY §8 walkthrough): Rust breaks before `impl Rect`
    * (adding it would pass 1000), Java/C++/C# descend into the
    * oversized class/namespace wrapper and break between members,
    * Ruby breaks at a module boundary, Python at a class boundary,
    * Markdown at a section heading with the fenced `#` kept opaque. */
  val expected: Seq[(String, String, Long, Long, String, String, Long, String)] = Seq(
    ("fixture.rs", "Rust", 0L, 977L, "//! Geometry primitives for the parity corpus.", "848c26a9cae3d10a07852990efb5158d", 975L, "454ca7eec911d3dff7ab81b3c729d5d3"),
    ("fixture.rs", "Rust", 1L, 795L, "impl Rect {", "a17284c91f1b720787dea1d4c2b8e0ae", 794L, "428a90c5f88517f4781d36ca1064adba"),
    ("fixture.js", "JavaScript", 0L, 888L, "// Event bus for the parity corpus.", "68a6474639fcb25c3a224c9102948802", 886L, "edba28dfce7f5f06ccdee35a76369505"),
    ("fixture.js", "JavaScript", 1L, 369L, "function names() {", "4a7aed1754f19dc26b04a3a96593ab37", 368L, "3a8249144cc1bfa7a68935332f698c13"),
    ("fixture.ts", "TypeScript", 0L, 719L, "// Typed cache for the parity corpus.", "9248d7079ce8aa2cb88e2150c972d480", 717L, "20d980581bdd2009eb170251203b66ac"),
    ("fixture.ts", "TypeScript", 1L, 710L, "export function memoize<V>(cache: TtlCache<V>, key: string,", "a270a27030ede53e72ece8d57e3c75a0", 709L, "044f7c291d6f74080ee8c010ac8c2c0f"),
    ("fixture.java", "Java", 0L, 136L, "package graft.parity;", "2aa07969b6e190549c23c82706b698f1", 135L, "165f3072f05afc9ce27442687c710ffa"),
    ("fixture.java", "Java", 1L, 828L, "public final class RunningStats {", "55a66fcf398e0e6102f4ee686944b59d", 826L, "800ebb735892cb0625195d8c7374b7d3"),
    ("fixture.java", "Java", 2L, 332L, "public double getMin() {", "f78966b6ae5493812281d66ae2095022", 327L, "45ab4f05b810f004f427bb2e9091ae8c"),
    ("fixture.cpp", "C++", 0L, 76L, "// Ring buffer for the parity corpus.", "6ecade4bd0a706e227030ccc75fbc848", 74L, "c99241d77de41edadaaf1b2f7dea27a6"),
    ("fixture.cpp", "C++", 1L, 941L, "namespace parity {", "4f0ba25c3463e58598eaf7f466a0ec86", 939L, "62148befca6c2d83f1e5e3789b605e62"),
    ("fixture.cpp", "C++", 2L, 349L, "double mean(const RingBuffer& rb) {", "ff8272b32a85b0003b718b29bed9fe61", 348L, "7d7ee3b01555b54e18b4b69eb326cb26"),
    ("fixture.c", "C", 0L, 946L, "/* Checksum helpers for the parity corpus. */", "4bd49b5f3060ade30c8038957f77b0be", 944L, "71730060fb6986a1c62b1a704139ba19"),
    ("fixture.c", "C", 1L, 343L, "uint32_t digest_chunks(const uint8_t *buf, size_t len, size_t chunk) {", "b43bb60088b877079be0e114311d000e", 342L, "48aa6e2df2623ba67a6b62c687529ea4"),
    ("fixture.rb", "Ruby", 0L, 950L, "# Inventory tracker for the parity corpus.", "0a3454d1d31c62793a27eeff4e2dbf3b", 949L, "8fd0e9e8dfb85a3f6439b85cd2ca0d37"),
    ("fixture.rb", "Ruby", 1L, 228L, "module Audit", "54f362e33f498d2a1fe1ee918f7ad2fa", 226L, "25be722f6632c3fd1aee7efaabe34934"),
    ("fixture.rb", "Ruby", 2L, 77L, "# A big class (over the budget) exercising def/end descent.", "2cec44a4ebe2f919c501728136a0266c", 75L, "058b21444508f8e393334ec2228b48a2"),
    ("fixture.rb", "Ruby", 3L, 986L, "def initialize(name)", "15fdb4a5a8dfea9803414cddc4548106", 983L, "b80fc0d1fff2ba3616835271fae47746"),
    ("fixture.rb", "Ruby", 4L, 37L, "def sealed?", "6822734ab6a935320697951605586e4d", 33L, "29acf6e559502870e44785fc44c267af"),
    ("fixture.cs", "C#", 0L, 49L, "using System;", "446c51a2ef0d549aa97e3405d08cf5b5", 47L, "5fec9cd3993360f65af0ee0a06a67034"),
    ("fixture.cs", "C#", 1L, 135L, "namespace Graft.Parity", "8f2c2baf664311ac853c151f3c618e65", 134L, "4f4fc8b557a934c47357820ef8370c03"),
    ("fixture.cs", "C#", 2L, 997L, "private readonly SortedDictionary<int, Queue<string>> lanes =", "37b76842e872f9a2a7e739e57f64a1a3", 988L, "13329bb2e29b45b4d66868cc4e422d2c"),
    ("fixture.cs", "C#", 3L, 8L, "}", "24b9118a1cd86bfb9315ef5a576d5540", 3L, "66f20ceb47fc90e9bbe6358b5d0358b0"),
    ("fixture.swift", "Swift", 0L, 867L, "// Temperature series for the parity corpus.", "7d3f4bcda942617dc96498e26e19339e", 865L, "b8df591e16e4bcec642fed9c0c5a06a8"),
    ("fixture.swift", "Swift", 1L, 522L, "func summarize(_ readings: [Reading]) -> Summary {", "ba8c872eafb0035fc5db76189a2515ee", 521L, "3d733932be2d5956fa6224822849827b"),
    ("fixture.go", "Go", 0L, 926L, "// Package parity holds the Go parity fixture.", "93d407e5a452808d376152ad58cca753", 925L, "8be3a63d099613186025b563441b972e"),
    ("fixture.go", "Go", 1L, 671L, "func Histogram(text string) map[int]int {", "e847396750cfe337fb344490ea1adf0b", 670L, "00394ef58730b7ffacd1c42f9835857e"),
    ("fixture.py", "Python", 0L, 839L, "\"\"\"Retry helpers for the parity corpus.\"\"\"", "31909b2b88d594aad8356e03d7c69a1b", 836L, "350b7ad7d62021bdfca6bae71dffc084"),
    ("fixture.py", "Python", 1L, 826L, "class CountingRetrier(Retrier):", "7ad0fc1aee18a2f6bb0f888732df6e89", 823L, "e01991d81d699b313dd1b85c7c98954b"),
    ("fixture.py", "Python", 2L, 845L, "class RetryPolicyTable:", "6f255d9f76488548f5783d5e05f65f0f", 843L, "4d8969025b43b76654350a9e1908d6b6"),
    ("fixture.py", "Python", 3L, 268L, "def merge(self, other):", "71a0637fe2168eb953a26a147b2d3cf5", 263L, "177291d7bba16638b0e1b0e3cf9bbc00"),
    ("fixture.md", "Markdown", 0L, 892L, "# Parity Corpus Guide", "2cab24576e0bacd9bfa138f322bca9ac", 890L, "dcccb3ea5ef1e49b6ad6949f4dc35dac"),
    ("fixture.md", "Markdown", 1L, 258L, "## Troubleshooting", "a7dcf6d7e7be466f43e44b894bfdb72f", 256L, "7203f7172f1c8561ca2586eb8d06708a"),
    ("fixture.md", "Markdown", 2L, 859L, "## Appendix: a long section exercising paragraph descent", "9a5508f68136160cb68ec2ad11755ccc", 857L, "df928fc3f537aa80dc621b3a36baa042"),
    ("fixture.md", "Markdown", 3L, 336L, "The third consideration is the budget itself. One thousand", "ae26721d29897598030abe2d9268c367", 335L, "165dba932fa5903465ad8ff4e09bc242"),
    ("alias.mjs", "JavaScript", 0L, 73L, "export const VERSION = 3;", "3b35adef67597c99741d5fc99cb17f78", 72L, "59f0182825d216f49c40e467127c4341"),
    ("alias.tsx", "TypeScript", 0L, 79L, "export function label(name: string): string {", "4fa8b6da09cc2a1a82344e6551320400", 78L, "760f1bbecd8de27511c6bad5005e0349"),
    ("alias.hpp", "C++", 0L, 102L, "#pragma once", "382e946a4686050c05de7b69fc7bc38f", 101L, "66e5808fbd91915082453038ea99d490"),
    ("alias.h", "C", 0L, 115L, "#ifndef PARITY_ALIAS_H", "aac3fcb3218bade29ba14f3b516294f4", 114L, "36fc56b7864180f9b230c8c47549e01b"),
    ("alias.pyi", "Python", 0L, 114L, "from typing import List", "8c40bf8802729e08bed8a91e5d7b8edb", 113L, "62026364494d9b711429bb4cb9662c4c"),
    ("alias.markdown", "Markdown", 0L, 74L, "# Alias", "1810b2886f47f12166f4c4cef677ac99", 73L, "5ad00c67b00c8b050c6ffc5a90b220e3"),
    ("alias.GO", "Go", 0L, 106L, "package parity", "ed9d2f7eabd5e262b17f001e64ba4b9f", 105L, "042b56d62a8590d83415908152202da4"))
}
