package graft.functions

/** Deterministic Chinese word segmentation: greedy longest-match over a
  * small built-in lexicon, single-char fallback.
  *
  * The reference segments Chinese eval text with jieba
  * (GOT/eval/pyevaltools/eval_ocr.py:80-85), which is unavailable
  * offline; the engine's default zh tokenization is per-character
  * (scene-text mode semantics, eval_ocr_scene.py:30-52). This segmenter
  * is the documented swap-in that narrows the jieba gap for word-level
  * zh metrics: forward maximum matching (the classic deterministic
  * algorithm jieba's DAG route approximates for in-lexicon text) over
  * common function/content words. Unlike jieba there is no HMM for OOV —
  * out-of-lexicon runs fall back to single characters, which keeps the
  * output deterministic and dependency-free.
  *
  * Use via Metrics.tokens(s, zhWords = true) or directly.
  */
object ZhSegment {

  /** Common multi-character words (function words, frequent compounds).
    * Longest-match means longer entries win automatically. */
  val lexicon: Set[String] = Set(
    // function words / particles / conjunctions
    "我们", "你们", "他们", "她们", "它们", "自己", "大家",
    "这个", "那个", "这些", "那些", "这里", "那里", "什么", "怎么", "为什么",
    "可以", "不能", "没有", "不是", "就是", "还是", "但是", "因为", "所以",
    "如果", "虽然", "然后", "现在", "已经", "正在", "一直", "非常", "比较",
    "而且", "或者", "并且", "不过", "只是", "也许", "当然", "其实",
    // common nouns / verbs in web text
    "时间", "问题", "工作", "学习", "生活", "世界", "中国", "国家", "公司",
    "技术", "系统", "数据", "信息", "网络", "计算", "程序", "软件", "硬件",
    "用户", "服务", "产品", "市场", "经济", "发展", "研究", "教育", "文化",
    "历史", "社会", "政府", "城市", "地方", "东西", "事情", "方法", "方式",
    "内容", "结果", "开始", "结束", "知道", "觉得", "认为", "希望", "需要",
    "使用", "提供", "进行", "实现", "处理", "分析", "设计", "开发", "测试",
    "文档", "页面", "图片", "文字", "表格", "公式", "模型", "训练", "识别",
    // numbers/measure compounds
    "一个", "两个", "三个", "第一", "第二", "一些", "很多", "所有")

  private val maxWordLen: Int = lexicon.iterator.map(_.length).max

  /** Forward maximum matching over a CJK string; non-CJK runs (latin,
    * digits, punctuation) are emitted as whitespace-split tokens. */
  def segment(s: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val latin = new java.lang.StringBuilder
    def flushLatin(): Unit = {
      if (latin.length > 0) {
        latin.toString.split("\\s+").foreach(t => if (t.nonEmpty) out += t)
        latin.setLength(0)
      }
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= '一' && c <= '龥') {
        flushLatin()
        var len = math.min(maxWordLen, s.length - i)
        var matched = false
        while (!matched && len >= 2) {
          val cand = s.substring(i, i + len)
          if (lexicon.contains(cand)) {
            out += cand; i += len; matched = true
          } else len -= 1
        }
        if (!matched) { out += c.toString; i += 1 }
      } else {
        latin.append(c); i += 1
      }
    }
    flushLatin()
    out.toArray
  }
}
